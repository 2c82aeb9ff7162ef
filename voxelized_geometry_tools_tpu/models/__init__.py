from . import fusion_pipeline
