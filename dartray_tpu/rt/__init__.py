from . import march, rays, engine

__all__ = ["march", "rays", "engine"]
