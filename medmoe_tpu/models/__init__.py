from medmoe_tpu.models import layers, swin, bert, moe  # noqa: F401
