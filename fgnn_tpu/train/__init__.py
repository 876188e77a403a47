from .loop import TrainState, create_train_state, make_train_step, masked_cross_entropy
