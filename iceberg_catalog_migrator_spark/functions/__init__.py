from .numeric import dsum, dsum_expr, ratio

__all__ = ["dsum", "dsum_expr", "ratio"]
