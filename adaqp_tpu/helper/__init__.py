from .dataset import GraphData, sbm_graph, rmat_graph, load_dataset  # noqa: F401
