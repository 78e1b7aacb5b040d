from .deterministic import davg, dsum, dsum_expr, round6  # noqa: F401
