from sparse_videogen_tpu.models.cosmos import model  # noqa: F401
