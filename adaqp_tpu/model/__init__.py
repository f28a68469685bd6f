from .gnn import init_params, apply_gnn  # noqa: F401
