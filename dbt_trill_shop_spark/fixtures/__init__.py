from .trends_fixtures import register_trends_sources

__all__ = ["register_trends_sources"]
