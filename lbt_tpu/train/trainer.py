"""Training loop.

Replaces the reference Trainer (reference trainer.py:31-192): one jitted
train step per batch (forward + quantized backward + controller updates +
momentum SGD fused by XLA), device-prefetched input, per-epoch evaluation,
periodic checkpoints with resume, JSONL/TensorBoard metrics.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from lbt_tpu.config import TrainConfig
from lbt_tpu.data.pipeline import batch_iterator, device_prefetch
from lbt_tpu.nn.model import Model
from lbt_tpu.train import checkpoint as ckpt
from lbt_tpu.train.optim import momentum_init, piecewise_lr
from lbt_tpu.train.step import (make_eval_step, make_scan_train_step,
                                make_train_step)
from lbt_tpu.utils.logging import MetricsWriter, get_logger


class Trainer:
    def __init__(
        self,
        model: Model,
        tc: TrainConfig,
        dataset: Dict,
        augment: Optional[Callable] = None,
        logger=None,
        logdir: Optional[str] = None,
        profile_steps: int = 0,
        native_loader: bool = False,
        aug_spec: Optional[Dict] = None,
    ):
        self.model = model
        self.tc = tc
        self.dataset = dataset
        self._augment_raw = augment
        self.augment = jax.jit(augment) if augment is not None else None
        self.native = None
        if native_loader:
            # C++ input pipeline: shuffle + augmentation on host threads,
            # one batch of lookahead (native/loader.cc)
            from lbt_tpu.data.native import NativeLoader
            if not NativeLoader.available():
                raise RuntimeError(
                    "native loader requested but could not be built")
            spec = aug_spec or {}
            xtr, ytr = dataset["train"]
            self.native = NativeLoader(
                xtr, ytr, tc.batch_size, pad=spec.get("pad", 0),
                flip=spec.get("flip", False), seed=tc.seed)
            self.augment = None  # augmentation now happens in C++
        # Multi-controller awareness: one process per host (SURVEY §5.8;
        # jax.distributed.initialize / parallel/multihost.py must run
        # before Trainer construction).  Every process executes the same
        # loop; only process 0 writes logs/metrics, and each process
        # feeds its host_batch_slice of the global batch.
        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        self.logger = logger or get_logger(
            f"{logdir}/experiment.log" if logdir and self.is_main else None)
        if not self.is_main:
            import logging
            self.logger = logging.getLogger("lbt_tpu.nonmain")
            self.logger.addHandler(logging.NullHandler())
            self.logger.propagate = False
        self.metrics = MetricsWriter(logdir if self.is_main else None)
        from lbt_tpu.utils.profiling import StepProfiler
        self.profiler = StepProfiler(
            f"{logdir}/profile" if logdir and self.is_main else None,
            profile_steps)

        tp = max(int(tc.tensor_parallel), 1)
        self.dp = bool(tc.data_parallel) and len(jax.devices()) // tp > 1
        if self.n_proc > 1 and not self.dp:
            raise ValueError(
                "multi-process runs require data_parallel=True (each "
                "process only holds its own batch shard)")
        if self.dp:
            from lbt_tpu.parallel.dp import make_dp_train_step
            from lbt_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(
                data=len(jax.devices()) // tp, model=tp)
            assert tc.batch_size % self.mesh.shape["data"] == 0, (
                "batch_size must divide across data shards")
            assert tc.batch_size % self.n_proc == 0, (
                "batch_size must divide across processes")
            self.train_step = make_dp_train_step(
                model, tc, self.mesh,
                lowbit_bits=8 if tc.lowbit_allreduce else None,
                lowbit_wire=tc.lowbit_wire)
        else:
            self.train_step = make_train_step(model, tc)
        # K-steps-per-dispatch scan block (single-device path; the native
        # loader augments on the host so the in-scan augment is skipped)
        self.scan_train_step = None
        if tc.scan_steps > 1 and not self.dp:
            self.scan_train_step = make_scan_train_step(
                model, tc, tc.scan_steps,
                augment=None if self.native else self._augment_raw)
        faithful = bool(model.cfg and model.cfg.faithful_eval)
        self.eval_step = make_eval_step(model, faithful_eval=faithful)
        self._masked_eval_step = None  # built lazily by _evaluate_dp

        impl = (model.cfg.noise_impl if model.cfg is not None
                else "threefry2x32")
        self.base_key = jax.random.key(tc.seed, impl=impl)
        params_key, self.data_key = jax.random.split(
            jax.random.fold_in(self.base_key, 0xA11CE))
        self.params, self.qstate = model.init(params_key)
        self.velocity = momentum_init(self.params)
        if self.dp:
            from lbt_tpu.parallel.lowbit import init_error_buffers
            self.ebuf = init_error_buffers(self.params)
            if self.mesh.shape["model"] > 1:
                # TP: lay the large weight kernels out over the 'model'
                # axis up front (parallel/mesh.py param_pspecs); the dp
                # shard_map step keeps 'model' an AUTO axis so GSPMD
                # partitions the contractions along these shardings.
                from lbt_tpu.parallel.mesh import param_pspecs, to_shardings
                shardings = to_shardings(self.mesh,
                                         param_pspecs(self.params))
                self.params = jax.device_put(self.params, shardings)
                self.velocity = jax.device_put(self.velocity, shardings)
                self.ebuf = jax.device_put(self.ebuf, shardings)
        else:
            self.ebuf = None
        self.step = 0
        self.epoch = 0

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.params))
        self.logger.info("Model %s: %d params\n%s",
                         model.name, n_params, model.info())
        self.logger.info(
            "Trainer: lr %g decay %g @ %s, momentum %g, wd %g, bs %d, "
            "%d epochs", tc.lr, tc.lr_decay_factor,
            list(tc.lr_decay_epochs), tc.momentum, tc.weight_decay,
            tc.batch_size, tc.n_epoch)

    # -- checkpoint ---------------------------------------------------------
    def _state(self):
        state = {
            "params": self.params,
            "qstate": self.qstate,
            "velocity": self.velocity,
            "epoch": self.epoch,
        }
        if self.dp:
            state["ebuf"] = self.ebuf
        return state

    def save(self, directory: Optional[str] = None):
        directory = directory or self.tc.checkpoint_dir
        if not directory:
            return
        ckpt.save_checkpoint(directory, self.step, self._state())
        self.logger.info("Saved checkpoint @ step %d to %s",
                         self.step, directory)

    def maybe_restore(self) -> bool:
        d = self.tc.checkpoint_dir
        if not d:
            return False
        step = ckpt.latest_step(d)
        if step is None:
            return False
        state = ckpt.restore_checkpoint(d, self._state(), step)
        self.params = state["params"]
        self.qstate = state["qstate"]
        self.velocity = state["velocity"]
        if self.dp and "ebuf" in state:
            self.ebuf = state["ebuf"]
        self.epoch = int(state["epoch"])
        self.step = step
        self.logger.info("Resumed from %s @ step %d (epoch %d)",
                         d, step, self.epoch)
        return True

    # -- loops --------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        tc = self.tc
        lr = piecewise_lr(tc.lr, tc.lr_decay_factor, tc.lr_decay_epochs,
                          epoch, tc.warmup_epochs)
        if (tc.reset_momentum_on_decay and epoch in tc.lr_decay_epochs):
            # reference quirk: fresh optimizer at each decay zeroes the
            # momentum slots (reference trainer.py:79-84)
            self.velocity = momentum_init(self.params)
            self.logger.info("Reset momentum slots (faithful mode)")

        if self.scan_train_step is not None:
            return self._train_epoch_scanned(epoch, lr)

        # DP: land each shard directly on its device during the prefetch
        # device_put (no gather/redistribute inside the step)
        placement = None
        if self.dp:
            from jax.sharding import NamedSharding, PartitionSpec as P
            placement = NamedSharding(self.mesh, P("data"))
        if self.native is not None:
            src = self.native.epoch(epoch)
        elif "train_iter" in self.dataset:
            # streaming dataset (e.g. data/imagefolder.py): the source
            # shuffles/augments per epoch and yields ready batches
            src = self.dataset["train_iter"](epoch, tc.batch_size)
        else:
            xtr, ytr = self.dataset["train"]
            src = batch_iterator(xtr, ytr, tc.batch_size, seed=tc.seed,
                                 epoch=epoch)
        if self.n_proc > 1:
            # multi-controller feed: every process iterates the same
            # host-side global batch (identically seeded), keeps its
            # host_batch_slice rows, and assembles the cross-process
            # array; device_prefetch's device_put is then a no-op on the
            # already-correctly-sharded global arrays
            from lbt_tpu.parallel.multihost import globalize_batches
            src = globalize_batches(src, placement)
        batches = device_prefetch(src, device=placement)
        lr_dev = jnp.float32(lr)
        last = {}
        t0, n_img = time.time(), 0
        first_step_logged = self.step > 0
        # input-stall accounting: host-blocked time waiting on the next
        # (prefetched) batch vs wall time — ~0% means the input pipeline
        # keeps ahead of the device (ROADMAP #6 verification metric)
        stall = 0.0

        def timed(it):
            nonlocal stall
            it = iter(it)
            while True:
                tw = time.time()
                try:
                    batch = next(it)
                except StopIteration:
                    return
                stall += time.time() - tw
                yield batch

        for b, (x, y) in enumerate(timed(batches)):
            if self.augment is not None:
                x = self.augment(
                    jax.random.fold_in(self.data_key, self.step), x)
            self.profiler.observe(self.step)
            if self.dp:
                (self.params, self.qstate, self.velocity, self.ebuf,
                 m) = self.train_step(
                    self.params, self.qstate, self.velocity, self.ebuf,
                    x, y, self.step, lr_dev, self.base_key)
            else:
                self.params, self.qstate, self.velocity, m = \
                    self.train_step(
                        self.params, self.qstate, self.velocity, x, y,
                        self.step, lr_dev, self.base_key)
            self.step += 1
            n_img += len(y)
            if not first_step_logged:
                jax.block_until_ready(m)
                self.logger.info(
                    "first train step (compile + warm-up) took %.1fs",
                    time.time() - t0)
                first_step_logged = True
            if (b + 1) % self.tc.log_every == 0:
                m = jax.device_get(m)
                rate = n_img / (time.time() - t0)
                self.logger.info(
                    "epoch %d batch %d loss %.4f acc %.4f (%.0f img/s)",
                    epoch, b + 1, m["loss"], m["accuracy"], rate)
                self.metrics.write(self.step, m, prefix="train/")
                self.metrics.write_param_means(self.step, self.params)
                last = m
        self.profiler.stop()
        wall = time.time() - t0
        if wall > 0 and n_img:
            self.logger.info(
                "epoch %d input stall %.1f%% (%.2fs of %.2fs)",
                epoch, 100.0 * stall / wall, stall, wall)
            self.metrics.write(self.step,
                               {"input_stall_frac": stall / wall},
                               prefix="train/")
        return last

    def _train_epoch_scanned(self, epoch: int, lr: float) -> Dict[str, float]:
        """K steps per dispatch: stack K host batches, run one scanned
        jit call.  Augmentation happens inside the compiled block with
        the same ``fold_in(data_key, step)`` derivation as the eager
        path, so the training trajectory is identical."""
        tc = self.tc
        K = tc.scan_steps
        if self.native is not None:
            it = self.native.epoch(epoch)
        elif "train_iter" in self.dataset:
            it = iter(self.dataset["train_iter"](epoch, tc.batch_size))
        else:
            xtr, ytr = self.dataset["train"]
            it = batch_iterator(xtr, ytr, tc.batch_size, seed=tc.seed,
                                epoch=epoch)

        def blocks():
            while True:
                xs, ys = [], []
                for _ in range(K):
                    try:
                        x, y = next(it)
                    except StopIteration:
                        break
                    xs.append(x)
                    ys.append(y)
                if not xs:
                    return
                yield np.stack(xs), np.stack(ys)
                if len(xs) < K:
                    return

        lr_dev = jnp.float32(lr)
        last = {}
        t0, n_img = time.time(), 0
        first_logged = self.step > 0
        n_steps_logged = 0
        for xs, ys in device_prefetch(blocks()):
            k = xs.shape[0]
            if k == K:
                self.profiler.observe(self.step)
                (self.params, self.qstate, self.velocity,
                 ms) = self.scan_train_step(
                    self.params, self.qstate, self.velocity, xs, ys,
                    self.step, lr_dev, self.base_key, self.data_key)
                self.step += k
                m_last = jax.tree.map(lambda a: a[-1], ms)
            else:
                # remainder block (epoch length not divisible by K):
                # fall back to the per-step fn
                for i in range(k):
                    x = xs[i]
                    if self.augment is not None:
                        x = self.augment(
                            jax.random.fold_in(self.data_key, self.step), x)
                    (self.params, self.qstate, self.velocity,
                     m_last) = self.train_step(
                        self.params, self.qstate, self.velocity, x, ys[i],
                        self.step, lr_dev, self.base_key)
                    self.step += 1
            n_img += int(np.prod(ys.shape))
            if not first_logged:
                jax.block_until_ready(m_last)
                self.logger.info(
                    "first scan block (compile + warm-up) took %.1fs",
                    time.time() - t0)
                first_logged = True
            n_steps_logged += k
            if n_steps_logged >= self.tc.log_every:
                n_steps_logged = 0
                m = jax.device_get(m_last)
                rate = n_img / (time.time() - t0)
                self.logger.info(
                    "epoch %d step %d loss %.4f acc %.4f (%.0f img/s)",
                    epoch, self.step, m["loss"], m["accuracy"], rate)
                self.metrics.write(self.step, m, prefix="train/")
                self.metrics.write_param_means(self.step, self.params)
                last = m
        self.profiler.stop()
        return last

    def evaluate(self) -> Dict[str, float]:
        if self.dp:
            return self._evaluate_dp()
        tc = self.tc
        if "test_iter" in self.dataset:
            batches = self.dataset["test_iter"](tc.eval_batch_size)
        else:
            xte, yte = self.dataset["test"]
            batches = batch_iterator(xte, yte, tc.eval_batch_size,
                                     shuffle=False, drop_remainder=False)
        tot = {"loss": 0.0, "accuracy": 0.0}
        n_batches = 0
        n_examples = 0.0
        faithful = bool(self.model.cfg and self.model.cfg.faithful_eval)
        key = jax.random.fold_in(self.base_key, 0xE7A1)
        for x, y in batches:
            m = self.eval_step(self.params, self.qstate, x, y, key)
            m = jax.device_get(m)
            count = float(m.get("count", x.shape[0]))
            w = 1.0 if faithful else count
            tot["loss"] += float(m["loss"]) * w
            tot["accuracy"] += float(m["accuracy"]) * w
            n_batches += 1
            n_examples += count
        # Default: count-weighted mean — exact over the eval set even when
        # the final batch is ragged (drop_remainder=False).  The reference
        # instead averages per-batch means (trainer.py:185-186), which
        # over-weights a short last batch; that behavior is preserved under
        # ``faithful_eval`` along with its batch-stat BN quirk.
        denom = max(n_batches, 1) if faithful else max(n_examples, 1.0)
        return {k: v / denom for k, v in tot.items()}

    def _evaluate_dp(self) -> Dict[str, float]:
        """Data-parallel evaluation: batches padded to one static shape,
        sharded over the mesh 'data' axis (GSPMD partitions the forward
        and inserts the reductions), sums count-weighted on the host.
        Under multi-controller each process feeds its host_batch_slice
        of the identical padded global batch.  Fixes the round-4 serial
        eval tail (VERDICT weak #2); exact for ragged final batches
        (masked sums).  Note ``faithful_eval``'s per-batch-mean
        over-weighting quirk is a single-device semantics knob — under
        DP eval the exact count-weighted mean is always used (the BN
        batch-stat half of the quirk is still honored inside the step).
        """
        tc = self.tc
        from jax.sharding import NamedSharding, PartitionSpec as P
        placement = NamedSharding(self.mesh, P("data"))
        nd = self.mesh.shape["data"]
        eb = tc.eval_batch_size
        if eb % nd:
            eb += nd - eb % nd  # pad target divides the data axis
        if "test_iter" in self.dataset:
            batches = self.dataset["test_iter"](tc.eval_batch_size)
        else:
            xte, yte = self.dataset["test"]
            batches = batch_iterator(xte, yte, tc.eval_batch_size,
                                     shuffle=False, drop_remainder=False)

        def padded():
            for x, y in batches:
                n = x.shape[0]
                if n < eb:
                    pad = ((0, eb - n),) + ((0, 0),) * (x.ndim - 1)
                    x = np.pad(np.asarray(x), pad)
                    y = np.pad(np.asarray(y), ((0, eb - n),))
                yield x, y, n

        faithful = bool(self.model.cfg and self.model.cfg.faithful_eval)
        if self._masked_eval_step is None:
            from lbt_tpu.train.step import make_masked_eval_step
            self._masked_eval_step = make_masked_eval_step(
                self.model, faithful_eval=faithful)
        key = jax.random.fold_in(self.base_key, 0xE7A1)
        loss_sum, correct_sum, n_examples = 0.0, 0.0, 0.0
        if self.n_proc > 1:
            from lbt_tpu.parallel.multihost import host_batch_slice
        for x, y, n in padded():
            if self.n_proc > 1:
                start, size = host_batch_slice(eb)
                x = jax.make_array_from_process_local_data(
                    placement, np.ascontiguousarray(x[start:start + size]))
                y = jax.make_array_from_process_local_data(
                    placement, np.ascontiguousarray(y[start:start + size]))
            else:
                x = jax.device_put(x, placement)
                y = jax.device_put(y, placement)
            m = self._masked_eval_step(self.params, self.qstate, x, y,
                                       jnp.int32(n), key)
            m = jax.device_get(m)
            loss_sum += float(m["loss_sum"])
            correct_sum += float(m["correct_sum"])
            n_examples += n
        denom = max(n_examples, 1.0)
        return {"loss": loss_sum / denom, "accuracy": correct_sum / denom}

    def train(self):
        self.maybe_restore()
        tc = self.tc
        while self.epoch < tc.n_epoch:
            self.train_epoch(self.epoch)
            ev = self.evaluate()
            self.logger.info("Epoch %d test accuracy %.4f loss %.4f",
                             self.epoch + 1, ev["accuracy"], ev["loss"])
            self.metrics.write(self.step, ev, prefix="test/")
            self.metrics.write_exponents(self.step, self.qstate)
            self.epoch += 1
            if (tc.checkpoint_dir and tc.checkpoint_every_epochs and
                    self.epoch % tc.checkpoint_every_epochs == 0):
                self.save()
        if tc.checkpoint_dir:
            self.save()
        return self.evaluate()
