from .run import training, evaluate_model_training
from .trainer import (TrainState, PhaseSpec, make_phase_spec, init_train_state,
                      solve_phase, make_train_step, make_chunk_runner)
from . import losses
