from medmoe_tpu.ops import losses  # noqa: F401
