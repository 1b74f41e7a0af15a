from protgram_directgcn_tpu.ops.spmm import (  # noqa: F401
    BucketedEllAdj,
    CooAdj,
    DenseAdj,
    EllAdj,
    build_adjacency,
    build_bucketed_ell,
    build_coo,
    build_dense,
    build_ell,
    choose_format,
    propagate,
)
