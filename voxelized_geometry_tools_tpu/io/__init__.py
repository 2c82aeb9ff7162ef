from . import viz, pointcloud2, messages
