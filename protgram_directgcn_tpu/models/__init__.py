from protgram_directgcn_tpu.models.directgcn import (  # noqa: F401
    DirectGCNConfig,
    init_directgcn_params,
    directgcn_apply,
)
