from agdiff_tpu.train.optimizer import (  # noqa: F401
    PlateauState,
    make_optimizer,
    plateau_init,
    plateau_update,
)
from agdiff_tpu.train.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
