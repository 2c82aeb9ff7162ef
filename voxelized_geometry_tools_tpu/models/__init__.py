from . import fusion_pipeline
from . import online_mapper
