from medmoe_tpu.eval.zero_shot import (  # noqa: F401
    zero_shot_classification,
    image_text_retrieval,
)
from medmoe_tpu.eval.linear_probe import linear_probe  # noqa: F401
