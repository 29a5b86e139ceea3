"""Training layer: state pytree, alternating update step, checkpointing."""

from autoencoder_based_image_compression_tpu.train.state import TrainState, init_train_state
from autoencoder_based_image_compression_tpu.train.step import make_step_fns
