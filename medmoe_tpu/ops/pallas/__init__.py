from medmoe_tpu.ops.pallas.gloria_attention import (  # noqa: F401
    gloria_similarity_pallas,
)
