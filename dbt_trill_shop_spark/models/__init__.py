from .trends import properties_path, trends_project

__all__ = ["properties_path", "trends_project"]
