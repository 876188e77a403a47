from .aggregate import gather_src, segment_agg
from .gnn import GCN, GraphSAGE, PinSAGE, GAT, build_model
