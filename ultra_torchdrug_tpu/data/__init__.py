from .graph import Graph, pack
