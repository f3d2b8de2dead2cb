from voicefixer_tpu.train.step import (  # noqa: F401
    TrainState, make_train_step, init_train_state)
