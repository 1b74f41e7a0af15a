from protgram_directgcn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_device_graph,
    shard_model_params,
    shard_training_inputs,
)
