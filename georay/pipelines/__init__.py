from .flagship import geotag_pipeline

__all__ = ["geotag_pipeline"]
