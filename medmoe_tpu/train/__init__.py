from medmoe_tpu.train import optim, state, step  # noqa: F401
