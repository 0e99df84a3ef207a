from .trends import trends_project

__all__ = ["trends_project"]
