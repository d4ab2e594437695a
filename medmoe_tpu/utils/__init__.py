from medmoe_tpu.utils.instantiate import instantiate, instantiate_dict  # noqa: F401
from medmoe_tpu.utils.logging import RankedLogger, get_logger  # noqa: F401
