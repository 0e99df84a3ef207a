from .seeds import SeedSpec, load_seed, load_seeds

__all__ = ["SeedSpec", "load_seed", "load_seeds"]
