from protgram_directgcn_tpu.utils import io  # noqa: F401
