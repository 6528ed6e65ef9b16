from .materialize import latest_image, materialize_changelog

__all__ = ["latest_image", "materialize_changelog"]
