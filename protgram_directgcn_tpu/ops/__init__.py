from protgram_directgcn_tpu.ops.spmm import (  # noqa: F401
    CooAdj,
    DenseAdj,
    EllAdj,
    build_adjacency,
    build_coo,
    build_dense,
    build_ell,
    choose_format,
    propagate,
)
