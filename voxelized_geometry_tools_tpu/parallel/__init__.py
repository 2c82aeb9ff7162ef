from . import mesh_utils, sharded
