"""Whole-RD-ladder training: every gamma trained simultaneously via vmap.

The reference's flagship study trains ONE model per rate point
(gamma in {10k..96k}, ``reconstructing_eae_kodak.py:607-611``),
sequentially - each a separate ``training_eae_imagenet.py`` run. On a
TPU the conv EAE is far too small to saturate the chip (1.76M params,
batch 10), so the whole one-model-per-gamma family trains at once:
the training state is stacked along a leading ladder axis and the
per-batch alternation runs under ``jax.vmap`` inside the same
scanned-epoch dispatch the single-model loop uses. The batch is shared
across the ladder (every reference run consumes the same training set);
the uniform quantization noise is drawn per model.

Only the gamma-dependent pieces differ per model, and both are data
under vmap: the loss scale, and the Adam learning-rate schedule
(gamma-keyed decay boundaries, ``EntropyAutoencoder.py:235-243``) -
realized here as ``LR_EAE * 0.1^((step>=b0)+(step>=b1))`` applied to
``optax.scale_by_adam`` updates (the decomposition of ``optax.adam``;
``piecewise_constant_schedule`` scales at count >= boundary, same
predicate).

The ladder family is the fixed-bin-width architecture
(``learn_bin_widths=False``; bin widths stay at their init, so the
bin-width SGD is a no-op and is omitted).

``ladder_slice_state`` exports one ladder entry as a standard
:class:`TrainState` (rebuilding the ``optax.adam`` optimizer-state
structure), so checkpoints, statistics collection and the RD evaluation
consume ladder-trained models unchanged.
"""

import jax
import jax.numpy as jnp
import optax

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.train.state import (
    TrainState,
    init_train_state,
    make_adam,
)
from autoencoder_based_image_compression_tpu.train.step import (
    _density_phase,
    _project_gdn,
    _rd_loss,
)


def init_ladder_state(key, gammas, bin_width_init=1.0,
                      ppi=csts.NB_POINTS_PER_INTERVAL,
                      max_itvs=csts.MAX_ITVS_PER_SIDE,
                      nb_itvs_init=csts.NB_ITVS_PER_SIDE_INIT):
    """Stacked TrainState over the gamma ladder (leading axis = model).

    The optimizer state is the bare ``optax.scale_by_adam`` core
    (gamma-independent); the learning rate is applied per model inside
    the update.
    """
    keys = jax.random.split(key, len(gammas))
    states = []
    for k in keys:
        single = init_train_state(k, 10000.0, bin_width_init,
                                  learn_bin_widths=False, ppi=ppi,
                                  max_itvs=max_itvs, nb_itvs_init=nb_itvs_init)
        states.append(single._replace(
            opt_eae=optax.scale_by_adam().init(single.params)))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *states)


def make_ladder_step_fns(gammas, ppi=csts.NB_POINTS_PER_INTERVAL,
                         max_itvs=csts.MAX_ITVS_PER_SIDE):
    """Jitted whole-ladder training functions.

    Returns ``{"training_fct", "train_step", "train_epoch"}`` - the
    vmapped counterparts of :func:`train.step.make_step_fns`'s entries
    (fixed-bin-width architecture). Each takes the stacked state; keys
    are split per model internally.
    """
    nb_models = len(gammas)
    gammas_arr = jnp.asarray(gammas, jnp.float32)
    bounds = jnp.asarray([csts.lr_boundaries(g) for g in gammas], jnp.float32)
    (b0_arr, b1_arr) = (bounds[:, 0], bounds[:, 1])
    adam_core = optax.scale_by_adam()
    static = dict(learn_bin_widths=False, ppi=ppi, max_itvs=max_itvs)

    def _lr(step, b0, b1):
        decays = ((step.astype(jnp.float32) >= b0).astype(jnp.float32)
                  + (step.astype(jnp.float32) >= b1).astype(jnp.float32))
        return csts.LR_EAE * jnp.power(0.1, decays)

    def _eae_phase(state, batch, key, gamma, b0, b1):
        grad_fn = jax.grad(_rd_loss, argnums=(0, 1), has_aux=True)
        ((grads_params, _), _) = grad_fn(
            state.params, state.bin_widths, batch, key, state.density, gamma,
            **static)
        (updates, opt_eae) = adam_core.update(grads_params, state.opt_eae,
                                              state.params)
        lr = _lr(state.step, b0, b1)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u, state.params,
                                        updates)
        params = _project_gdn(params, False)
        return state._replace(params=params, opt_eae=opt_eae,
                              step=state.step + 1)

    def _single_fct(state, batch, key):
        return _density_phase(state, batch, key, **static)

    def _single_step(state, batch, key, gamma, b0, b1):
        (key_fct, key_eae) = jax.random.split(key)
        state = _density_phase(state, batch, key_fct, **static)
        return _eae_phase(state, batch, key_eae, gamma, b0, b1)

    @jax.jit
    def training_fct(states, batch, key):
        keys = jax.random.split(key, nb_models)
        return jax.vmap(_single_fct, in_axes=(0, None, 0))(states, batch, keys)

    @jax.jit
    def train_step(states, batch, key):
        keys = jax.random.split(key, nb_models)
        return jax.vmap(_single_step, in_axes=(0, None, 0, 0, 0, 0))(
            states, batch, keys, gammas_arr, b0_arr, b1_arr)

    @jax.jit
    def train_epoch(states, dataset, rows, key):
        """One shuffled epoch for the WHOLE ladder in one dispatch
        (``lax.scan`` over mini-batches, ``vmap`` over models inside
        the body; same dispatch-amortization rationale as the
        single-model ``train_epoch``)."""
        epoch_keys = jax.random.split(key, rows.shape[0])

        def body(carry, xs):
            (batch_rows, subkey) = xs
            batch = jnp.take(dataset, batch_rows, axis=0)
            keys = jax.random.split(subkey, nb_models)
            carry = jax.vmap(_single_step, in_axes=(0, None, 0, 0, 0, 0))(
                carry, batch, keys, gammas_arr, b0_arr, b1_arr)
            return (carry, None)

        (states, _) = jax.lax.scan(body, states, (rows, epoch_keys))
        return states

    return {
        "training_fct": training_fct,
        "train_step": train_step,
        "train_epoch": train_epoch,
    }


def shard_ladder_state(ladder_states, mesh, axis="data"):
    """Shards the ladder (leading) axis of every leaf over a mesh axis.

    Model-parallel-over-gammas: each device trains its own subset of the
    ladder with ZERO cross-device communication (the models are
    independent), so the study scales near-linearly with devices - the
    distribution axis the reference's sequential per-gamma runs cannot
    express. The number of ladder entries must divide the mesh axis
    size evenly (pad the gamma list otherwise). The jitted ladder step
    functions consume the sharded state as-is: GSPMD partitions the
    vmapped program along the ladder axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(axis))
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), ladder_states)


def make_ladder_eval_fn(gammas, ppi=csts.NB_POINTS_PER_INTERVAL,
                        max_itvs=csts.MAX_ITVS_PER_SIDE):
    """Per-model training indicators on a shared eval batch.

    Returns a jitted ``evaluation(states, batch, key) -> (rec_errors,
    approx_entropies)`` of shape (K,) each (the noise-perturbed RD-loss
    components, reference ``EntropyAutoencoder.py:542-589``'s core
    indicators vectorized over the ladder)."""
    nb_models = len(gammas)
    gammas_arr = jnp.asarray(gammas, jnp.float32)

    def _one(state, key, gamma, batch):
        (_, (rec_error, approx_entropy)) = _rd_loss(
            state.params, state.bin_widths, batch, key, state.density, gamma,
            False, ppi, max_itvs)
        return (rec_error, approx_entropy)

    @jax.jit
    def evaluation(states, batch, key):
        keys = jax.random.split(key, nb_models)
        return jax.vmap(_one, in_axes=(0, 0, 0, None))(states, keys,
                                                       gammas_arr, batch)

    return evaluation


def _core_adam_state(opt_eae):
    """The ScaleByAdamState inside a single-model optimizer state."""
    if isinstance(opt_eae, optax.ScaleByAdamState):
        return opt_eae
    for part in opt_eae:
        if isinstance(part, optax.ScaleByAdamState):
            return part
    raise ValueError("no ScaleByAdamState found in the optimizer state.")


def ladder_stack_states(states):
    """Stacks single-model :class:`TrainState`s into a ladder state.

    Inverse of :func:`ladder_slice_state` (used to resume a ladder part
    from the per-model checkpoints of the previous part); the optimizer
    states are reduced to their ``scale_by_adam`` cores.
    """
    cores = [s._replace(opt_eae=_core_adam_state(s.opt_eae)) for s in states]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *cores)


def ladder_slice_state(ladder_states, idx, gamma):
    """Extracts ladder entry ``idx`` as a standard :class:`TrainState`.

    Rebuilds the ``optax.adam(schedule)`` optimizer-state structure the
    single-model pipeline (checkpoints, resume) expects, carrying over
    the Adam moments and step count.
    """
    sliced = jax.tree_util.tree_map(lambda x: x[idx], ladder_states)
    core = sliced.opt_eae  # ScaleByAdamState
    template = make_adam(gamma).init(sliced.params)

    def _rebuild(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=core.count, mu=core.mu,
                                          nu=core.nu)
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=core.count)
        return node

    is_opt_leaf = lambda n: isinstance(
        n, (optax.ScaleByAdamState, optax.ScaleByScheduleState))
    opt_eae = tuple(_rebuild(part) for part in template) \
        if isinstance(template, tuple) else jax.tree_util.tree_map(
            _rebuild, template, is_leaf=is_opt_leaf)
    return TrainState(params=sliced.params, density=sliced.density,
                      bin_widths=sliced.bin_widths, opt_eae=opt_eae,
                      step=sliced.step)
