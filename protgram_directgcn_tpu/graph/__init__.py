from protgram_directgcn_tpu.graph.structure import (  # noqa: F401
    NgramGraph,
    DeviceGraph,
    load_graph,
    save_graph,
)
from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder  # noqa: F401
