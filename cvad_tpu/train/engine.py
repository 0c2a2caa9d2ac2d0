"""The training engine: one epoch loop serving all model families.

Unifies the reference's five hand-written loops (SURVEY.md §2.7) — epoch
iteration, loss-component accounting, LR scheduling, NaN skipping, eval
cadence, best/interval checkpointing, history JSON — over the per-family
jitted steps from `cvad_tpu.train.tasks`.

TPU-native structure: one `jax.jit`-compiled train step (state donated, batch
sharded over the mesh's 'data' axis, params replicated — XLA inserts the
gradient all-reduce over ICI), a device-prefetching input feed, metrics
packed into one on-device vector with a single host fetch per epoch.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from cvad_tpu.config import (ExperimentConfig, FamilyAConfig, FamilyBConfig,
                             FamilyCConfig, FamilyDConfig)
from cvad_tpu.data.batcher import BatchLoader, DevicePrefetcher
from cvad_tpu.evaluation.metrics import (binary_metrics, family_d_eval_metrics,
                                         percentile_threshold,
                                         score_separation)
from cvad_tpu.runtime.checkpoint import CheckpointManager
from cvad_tpu.runtime.history import TrainingHistory
from cvad_tpu.runtime.mesh import batch_sharding, create_mesh, replicated
from cvad_tpu.runtime.metrics import MetricLogger, StepTimer
from cvad_tpu.train.optim import HostScheduler, set_lr
from cvad_tpu.train.tasks import build_task


class Trainer:
    """End-to-end trainer for one `ExperimentConfig`."""

    def __init__(self, cfg: ExperimentConfig, mesh=None,
                 out_dir: Optional[str] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(
            cfg.parallel.data_axis, cfg.parallel.temporal_axis)
        self.task = build_task(cfg)
        self.out_dir = Path(out_dir or cfg.train.out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.history = TrainingHistory(self.out_dir / cfg.train.history_name)
        self.logger = MetricLogger(self.out_dir / "metrics.jsonl")
        self.scheduler = HostScheduler(cfg.optim, cfg.train.num_epochs)
        self.ckpt = CheckpointManager(self.out_dir / "checkpoints")
        self.state = None
        self._jit_train = None
        self._jit_eval = None
        self._best = None
        self._since_best = 0  # early-stop counter; checkpointed with _best
        self._mid_resume = None  # set by restore() from a 'mid' checkpoint
        self._device_caches: Dict[int, Any] = {}  # id(loader) -> cache|None

    # -- setup ---------------------------------------------------------------

    def init_state(self, sample_batch: Dict[str, np.ndarray]) -> None:
        import jax.numpy as jnp

        rng = jax.random.key(self.cfg.train.seed)
        sample = _to_jnp(sample_batch)
        state = self.task.init_state(rng, sample)
        rep = replicated(self.mesh)
        self.state = jax.device_put(state, rep)

        # metric keys, discovered without running the step (the engine always
        # feeds a "valid" mask, so discover keys with one present)
        sample = {**sample, "valid": jnp.ones(
            jax.tree_util.tree_leaves(sample)[0].shape[0], jnp.float32)}
        _, metrics_shape = jax.eval_shape(self.task.train_step, state, sample,
                                          rng)
        self._metric_keys = sorted(metrics_shape)

        # The step returns metrics packed into ONE device vector: per-step
        # host fetches of many tiny arrays are ruinous on high-latency
        # interconnects (~30ms round trip each here); the engine accumulates
        # the vector on device and fetches once per epoch.
        def packed_step(state, batch, rng):
            new_state, metrics = self.task.train_step(state, batch, rng)
            vec = jnp.stack([metrics[k].astype(jnp.float32)
                             for k in self._metric_keys])
            return new_state, vec

        # when the mesh has a 'time' axis, clips additionally shard their T
        # axis — GSPMD inserts the temporal-conv halo exchanges (numerically
        # identical to unsharded; tests/test_temporal.py)
        self._time_dim = 1 if self.mesh.shape.get("time", 1) > 1 else None
        bsh_data = batch_sharding(self.mesh)
        bsh_clips = batch_sharding(self.mesh, self._time_dim)
        # every engine-fed batch carries a "valid" mask (all-ones when the
        # batch divides the mesh) so remainder batches are gradient-exact.
        # Shardings follow the sample's keys so extra per-batch arrays
        # (e.g. an injected "pseudo_targets" stream) shard over 'data' too.
        bsh = {k: (bsh_clips if k == "clips" else bsh_data) for k in sample}
        donate = (0,) if self.cfg.train.donate_state else ()
        self._jit_train = jax.jit(
            packed_step,
            in_shardings=(rep, bsh, rep),
            donate_argnums=donate,
        )

        # multi-step variant: lax.scan over K stacked batches in ONE device
        # call — per-dispatch latency amortizes K-fold (steps_per_call > 1)
        def multi_step(state, batches, rng):
            def body(s, batch):
                new_s, vec = packed_step(s, batch, rng)
                return new_s, vec
            state, vecs = jax.lax.scan(body, state, batches)
            return state, vecs.sum(axis=0)

        # batches stacked on a new leading axis: shard axis 1 (batch) on
        # 'data'; with a time axis, stacked clips (K, B, T, ...) also shard
        # T — same temporal sharding as the single-step path
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._stacked_sh = NamedSharding(self.mesh, P(None, "data"))
        if self._time_dim is not None:
            spec = [None, "data"] + [None] * self._time_dim
            spec[self._time_dim + 1] = "time"
            self._stacked_clips_sh = NamedSharding(self.mesh, P(*spec))
        else:
            self._stacked_clips_sh = self._stacked_sh
        stacked_bsh = {k: (self._stacked_clips_sh if k == "clips"
                           else self._stacked_sh) for k in sample}
        self._jit_train_multi = jax.jit(
            multi_step,
            in_shardings=(rep, stacked_bsh, rep),
            donate_argnums=donate,
        )
        # eval batches inherit their existing shardings (None): eval loaders
        # need not carry train-only keys like an injected pseudo_targets
        self._jit_eval = jax.jit(self.task.eval_step, in_shardings=(rep, None))
        self._rng = jax.device_put(jax.random.key(self.cfg.train.seed + 1), rep)

    def put_batch(self, host_batch: Dict[str, np.ndarray]):
        """Pad a host batch to the mesh, attach the "valid" loss mask, and
        device-put it with the canonical shardings — the one-call host->device
        boundary for direct `_jit_train`/`_jit_eval` use (bench, dryrun)."""
        from cvad_tpu.runtime.mesh import pad_with_valid, shard_batch

        padded = pad_with_valid(host_batch, self.mesh.shape["data"])
        return shard_batch(self.mesh, padded,
                           time_dim=getattr(self, "_time_dim", None))

    def put_chunk(self, host_batches):
        """Stack equal-shaped host batches into one (K, B, ...) device chunk
        for the scanned multi-step call (`steps_per_call` > 1) — K train steps
        per dispatch, amortizing the per-call latency K-fold."""
        from cvad_tpu.runtime.mesh import pad_with_valid

        nd = self.mesh.shape["data"]
        padded = [pad_with_valid(b, nd) for b in host_batches]
        stacked = {k: np.stack([np.asarray(p[k]) for p in padded])
                   for k in padded[0]}
        return self._put_stacked(stacked)

    def _put_stacked(self, stacked: Dict[str, np.ndarray]):
        return {k: jax.device_put(v, self._stacked_clips_sh if k == "clips"
                                  else self._stacked_sh)
                for k, v in stacked.items()}

    def restore(self, sample_batch: Dict[str, np.ndarray],
                step="latest") -> Optional[int]:
        """Restore state + history + scheduler from a checkpoint for
        mid-training resume (never possible in the reference — SURVEY.md §5
        'No mid-training resume is ever actually invoked').  Returns the
        restored step or None if no checkpoint exists."""
        if self.state is None:
            self.init_state(sample_batch)
        self._mid_resume = None
        if step == "latest":
            step = self.ckpt.latest_step()
            # a 'mid' (intra-epoch) checkpoint supersedes the last epoch
            # checkpoint iff it belongs to a LATER epoch; an older leftover
            # 'mid' is stale and ignored
            mid = (self.ckpt.restore_history("mid") or {}).get("_mid")
            if mid and (step is None or int(mid["epoch"]) > step):
                step = "mid"
        if step is None:
            return None
        template = jax.device_get(self.state)
        restored = self.ckpt.restore(step, template)
        self.state = jax.device_put(restored, replicated(self.mesh))
        hist = self.ckpt.restore_history(step)
        if hist:
            self._mid_resume = hist.pop("_mid", None)
            sched = hist.pop("_scheduler", None)
            # restore the best-metric watermark: without it, the first eval
            # after a resume would overwrite the 'best' checkpoint with a
            # possibly-worse model.  The early-stop counter comes with it —
            # restarting it at 0 would make a resumed run stop LATER than
            # the uninterrupted run (breaking bit-identical resume under
            # early_stop_patience)
            self._best = hist.pop("_best", None)
            self._since_best = int(hist.pop("_since_best", 0) or 0)
            for k in self.history.KEYS:
                self.history.data[k] = list(hist.get(k, []))
            if sched:
                self.scheduler.load_state_dict(sched)
                self.state = self.state.replace(
                    opt_state=set_lr(self.state.opt_state, self.scheduler.lr))
        return step if isinstance(step, int) else self.history.last_epoch

    def _ckpt_payload(self) -> Dict:
        return {**self.history.as_dict(),
                "_scheduler": self.scheduler.state_dict(),
                "_best": self._best,
                "_since_best": self._since_best}

    def _save_mid(self, epoch: int, count: int, total_vec) -> None:
        """Rolling preemption checkpoint: state + the in-progress epoch's
        batch index and partial metric accumulator, so `restore` + `fit`
        continue the epoch at the exact batch (bit-identical to the
        uninterrupted run — tests/test_resume.py)."""
        payload = {**self._ckpt_payload(),
                   "_mid": {"epoch": int(epoch), "count": int(count),
                            "metric_vec": [float(x)
                                           for x in np.asarray(total_vec)]}}
        self.ckpt.save("mid", self.state, history=payload)

    def _clip_cache(self, loader, strict: Optional[bool] = None):
        """The loader's `DeviceClipCache` when the device-cache knob and
        eligibility allow one (built once per loader, reused every epoch).
        Replaces the per-epoch host->device clip stream with HBM-resident
        gathers — the structural fix for the reference's per-epoch
        DataLoader re-transfer (``causal_anomaly_detection.py:1212-1214``).

        `strict` controls whether ineligibility under mode 'on' raises:
        train loaders default to strict (the user demanded the cache);
        `evaluate` passes strict=False so an oversized/ineligible EVAL
        split falls back to the uncached path instead of killing a
        training run at its first eval."""
        mode = self.cfg.train.device_cache
        if strict is None:
            strict = mode == "on"
        if mode == "off" or not hasattr(loader, "epoch_index_batches"):
            if strict and mode == "on" and not hasattr(
                    loader, "epoch_index_batches"):
                raise ValueError(
                    "train.device_cache='on' needs a BatchLoader-style "
                    "loader exposing epoch_index_batches")
            return None
        import weakref

        # memo keyed by id() BUT verified through a weakref: CPython reuses
        # ids after garbage collection, so a bare id key could hand a NEW
        # loader a stale cache built for a dead one
        key = id(loader)
        entry = self._device_caches.get(key)
        if entry is not None:
            ref, cached = entry
            if ref() is loader:
                return cached
        from cvad_tpu.data.device_cache import DeviceClipCache, cache_eligible

        dev = self.mesh.devices.flat[0]
        # the HBM-fraction budget covers ALL caches this trainer holds:
        # train + eval splits built independently could otherwise claim up
        # to 2x the fraction together
        reserved = sum(c.nbytes for _, c in self._device_caches.values()
                       if c is not None)
        if not cache_eligible(loader, self.cfg.train.device_cache_hbm_frac,
                              dev, reserved_bytes=reserved):
            if strict and mode == "on":
                raise ValueError(
                    "train.device_cache='on' but the loader is ineligible "
                    "(needs transfer_dtype='uint8', a get_uint8 dataset, "
                    "single-process, and the split to fit "
                    f"{self.cfg.train.device_cache_hbm_frac:.0%} of device "
                    "memory alongside existing caches)")
            self._device_caches[key] = (weakref.ref(loader), None)
            return None
        cache = DeviceClipCache(loader, self.mesh,
                                time_dim=getattr(self, "_time_dim", None))
        self._device_caches[key] = (weakref.ref(loader), cache)
        self.logger.log("device_cache", clips=len(loader.dataset),
                        mbytes=round(cache.nbytes / 1e6, 1))
        return cache

    # -- epochs --------------------------------------------------------------

    def train_epoch(self, loader: Iterable[Dict[str, np.ndarray]],
                    epoch: int, record: bool = True, skip_batches: int = 0,
                    initial: Optional[Dict] = None) -> Dict[str, float]:
        assert self.state is not None, "call init_state first"
        count = 0
        timer = StepTimer()
        nd = self.mesh.shape["data"]  # batch shards over 'data' only
        total_vec = None  # device accumulator — no per-step host sync
        # device-resident clip cache: the whole split lives in HBM and every
        # batch is a device-side gather — the host ships only shuffle
        # indices/labels/valid masks (cvad_tpu.data.device_cache)
        cache = self._clip_cache(loader)
        # shuffle order follows the global training epoch so interrupted runs
        # replay the same batch sequence on resume (the cache path pins the
        # epoch inside epoch_index_batches)
        if cache is None and hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)
        source: Iterable = loader
        if skip_batches and cache is None:  # mid-epoch resume: exact batch
            if hasattr(loader, "iter_from"):
                source = loader.iter_from(skip_batches)
            else:
                import itertools

                source = itertools.islice(iter(loader), skip_batches, None)
        if initial is not None:  # restored partial metric accumulator
            import jax.numpy as jnp

            total_vec = jnp.asarray(np.asarray(initial["metric_vec"],
                                               np.float32))
            count = int(initial["count"])
        save_every = self.cfg.train.save_every_steps if record else 0
        next_save = (count // save_every + 1) * save_every if save_every else 0
        k = max(1, self.cfg.train.steps_per_call)
        if k > 1:
            if cache is not None:
                feed: Iterable = cache.device_batches(epoch, k, nd,
                                                      skip=skip_batches)
            else:
                # full chunks arrive stacked (K, B, ...) for the scanned
                # multi-step call; the remainder arrives as single batches
                from cvad_tpu.runtime.mesh import shard_batch as _shard

                def put_fn(item):
                    # batches arrive already padded (with the correct
                    # 'valid' mask) from _chunk_batches — re-padding here
                    # would rebuild 'valid' as all-ones and let the
                    # duplicate rows into the gradient
                    if item["clips"].ndim == 6:
                        return self._put_stacked(item)
                    return _shard(self.mesh, item, time_dim=self._time_dim)

                feed = DevicePrefetcher(_chunk_batches(source, k, nd),
                                        put_fn=put_fn)
            log_every = self.cfg.train.log_every
            for item in feed:
                if item["clips"].ndim == 6:  # stacked chunk
                    self.state, vec = self._jit_train_multi(
                        self.state, item, self._rng)
                    dk = k
                else:
                    self.state, vec = self._jit_train(self.state, item,
                                                      self._rng)
                    dk = 1
                count += dk
                total_vec = vec if total_vec is None else total_vec + vec
                if next_save and count >= next_save:
                    self._save_mid(epoch, count, total_vec)
                    next_save = (count // save_every + 1) * save_every
                # per-dispatch observability, mirroring the k==1 branch:
                # steps_per_s counts optimizer steps (k per dispatch), and a
                # train_batch line fires whenever `count` crosses a
                # log_every boundary (chunk metrics are k-step sums -> /dk)
                t = timer.tick()
                if count // log_every > (count - dk) // log_every:
                    host = dict(zip(self._metric_keys, np.asarray(vec) / dk))
                    self.logger.log(
                        "train_batch", epoch=epoch, batch=count, **host,
                        steps_per_s=count / max(t["elapsed_s"], 1e-9))
        else:
            feed = (cache.device_batches(epoch, 1, nd, skip=skip_batches)
                    if cache is not None else
                    DevicePrefetcher(source, self.mesh, pad_to_multiple=nd,
                                     time_dim=self._time_dim))
            for batch in feed:
                self.state, vec = self._jit_train(self.state, batch, self._rng)
                total_vec = vec if total_vec is None else total_vec + vec
                count += 1
                if next_save and count >= next_save:
                    self._save_mid(epoch, count, total_vec)
                    next_save = (count // save_every + 1) * save_every
                # tick EVERY step (rate = count/elapsed); ticking only on
                # log steps understated steps_per_s by a factor of log_every
                t = timer.tick()
                if count % self.cfg.train.log_every == 0:
                    host = dict(zip(self._metric_keys, np.asarray(vec)))
                    self.logger.log("train_batch", epoch=epoch, batch=count,
                                    **host, steps_per_s=t["steps_per_s"])
        if total_vec is None:
            avg: Dict[str, float] = {}
        else:
            vals = np.asarray(total_vec) / max(count, 1)  # ONE fetch per epoch
            avg = {k: float(v) for k, v in zip(self._metric_keys, vals)}
        if not record:  # e.g. profiling epochs: don't pollute history/schedule
            return avg
        lr = self.scheduler.lr
        self.history.record_epoch(epoch, avg.get("loss", float("nan")),
                                  {k: v for k, v in avg.items() if k != "loss"},
                                  lr)
        # epoch-granular LR schedule, then push the new lr into opt_state
        new_lr = self.scheduler.step(avg.get("loss"))
        if new_lr != lr:
            self.state = self.state.replace(
                opt_state=set_lr(self.state.opt_state, new_lr))
            self.logger.log("lr_update", epoch=epoch, lr=new_lr)
        return avg

    def evaluate(self, loader: Iterable[Dict[str, np.ndarray]]
                 ) -> Dict[str, Any]:
        import jax.numpy as jnp

        from cvad_tpu.runtime.mesh import pad_with_valid, shard_batch

        outs: Dict[str, list] = {}
        nd = self.mesh.shape["data"]
        # HBM clip cache for the eval split too (unordered loaders only —
        # the cache replays dataset order, which equals iteration order
        # exactly when shuffle is off): eval epochs then cost zero clip H2D
        cache = (self._clip_cache(loader, strict=False)
                 if not getattr(loader, "shuffle", True) else None)
        if cache is not None:
            # unshuffled composition is epoch-invariant: _batch_indices
            # gives the same per-batch sizes device_batches will use,
            # without advancing the loader's shuffle epoch
            counts = [len(b) for b in loader._batch_indices()]
            feed = zip(cache.device_batches(0, 1, nd), counts)
        else:
            feed = ((b, jax.tree_util.tree_leaves(b)[0].shape[0])
                    for b in loader)
        for host_batch, valid in feed:
            if cache is not None:
                dev_batch = host_batch  # already gathered + padded on device
            else:
                padded = pad_with_valid(host_batch, nd)
                dev_batch = shard_batch(self.mesh, padded,
                                        time_dim=self._time_dim)
            out = self._jit_eval(self.state, dev_batch)
            for k, v in out.items():
                # trim DP padding rows on device; results stay device-side so
                # the epoch needs only one host fetch at the end
                outs.setdefault(k, []).append(
                    v[:valid] if v.ndim and v.shape[0] >= valid else v)
        merged_dev = {k: (jnp.concatenate(v) if v[0].ndim else jnp.stack(v))
                      for k, v in outs.items()}
        merged = {k: np.asarray(v) for k, v in
                  jax.device_get(merged_dev).items()}
        return self._eval_metrics(merged)

    def _eval_metrics(self, out: Dict[str, np.ndarray]) -> Dict[str, Any]:
        model_cfg = self.cfg.model
        if isinstance(model_cfg, FamilyDConfig):
            m = family_d_eval_metrics(out["predictions"], out["causal_graphs"],
                                      self.cfg.loss.edge_threshold)
            return {**m, "predictions": out["predictions"],
                    "causal_graphs": out["causal_graphs"]}
        if isinstance(model_cfg, FamilyCConfig):
            m = binary_metrics(out["predictions"], out["labels"])
            m["loss"] = float(np.mean(out["loss"]))
            return {**m, "predictions": out["predictions"],
                    "labels": out["labels"]}
        if isinstance(model_cfg, FamilyBConfig):
            thr = percentile_threshold(out["predictions"], out["labels"])
            m = binary_metrics(out["predictions"], out["labels"], thr)
            m.update(score_separation(out["predictions"], out["labels"]))
            m["val_loss"] = float(np.mean(out["loss"]))
            return {**m, "predictions": out["predictions"],
                    "labels": out["labels"]}
        if isinstance(model_cfg, FamilyAConfig):
            from cvad_tpu.evaluation.metrics import family_a_test_analysis

            m = binary_metrics(out["predictions"], out["labels"])
            m["val_acc"] = m["accuracy"]
            # reference test_model's detailed surface (:796-835): per-sample
            # rows + prediction counts via both scoring methods, plus the
            # direct/causal blend pieces the blended score was built from
            analysis = family_a_test_analysis(
                out["predictions"], out["labels"], out["direct_predictions"])
            return {**m, "analysis": analysis,
                    "predictions": out["predictions"],
                    "causal_scores": out["causal_scores"],
                    "direct_predictions": out["direct_predictions"],
                    "labels": out["labels"]}
        raise KeyError(type(model_cfg).__name__)

    # -- full run ------------------------------------------------------------

    def fit(self, train_loader, eval_loader=None,
            sample_batch: Optional[Dict[str, np.ndarray]] = None) -> Dict:
        cfg = self.cfg.train
        if self.state is None:
            if sample_batch is None:
                # BatchLoader: take the first batch WITHOUT starting an
                # epoch (an abandoned iterator would strand its producer
                # thread on the bounded queue and shift the shuffle epoch)
                if hasattr(train_loader, "sample_batch"):
                    sample_batch = train_loader.sample_batch()
                else:
                    sample_batch = next(iter(train_loader))
            self.init_state(sample_batch)
        t0 = time.time()
        start_epoch = self.history.last_epoch + 1
        trained_any = False
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            trained_any = True
            mid = self._mid_resume
            if mid is not None and int(mid["epoch"]) == epoch:
                self._mid_resume = None  # consume: applies to this epoch only
                avg = self.train_epoch(train_loader, epoch,
                                       skip_batches=int(mid["count"]),
                                       initial=mid)
            else:
                avg = self.train_epoch(train_loader, epoch)
            self.logger.log("epoch", epoch=epoch, **{k: v for k, v in avg.items()})
            is_eval = (eval_loader is not None
                       and ((epoch - 1) % cfg.eval_every == 0
                            or epoch == cfg.num_epochs))
            if is_eval:
                metrics = self.evaluate(eval_loader)
                scalar = {k: v for k, v in metrics.items()
                          if isinstance(v, (int, float))}
                self.history.record_eval(scalar)
                self.logger.log("eval", epoch=epoch, **scalar)
                improved = self._maybe_save_best(epoch, scalar, avg)
                self._since_best = 0 if improved else self._since_best + 1
                # early stopping (family B: patience 10, :506-515)
                if cfg.early_stop_patience and self._since_best >= cfg.early_stop_patience:
                    self.logger.log("early_stop", epoch=epoch,
                                    patience=cfg.early_stop_patience)
                    break
            if cfg.save_interval and epoch % cfg.save_interval == 0:
                self.ckpt.save(int(epoch), self.state,
                               history=self._ckpt_payload())
        if cfg.reload_best:
            # reload best checkpoint at end (reference :518-522)
            self.ckpt.wait()
            try:
                restored = self.ckpt.restore("best", jax.device_get(self.state))
                self.state = jax.device_put(restored, replicated(self.mesh))
                self.logger.log("reloaded_best", best=self._best)
            except Exception as e:  # noqa: BLE001 — no best saved yet
                self.logger.log("reload_best_failed", error=str(e))
        if cfg.save_every_steps and trained_any:
            # the run completed AND actually trained: drop the rolling
            # preemption snapshot so a later restore can't pick a
            # final-epoch 'mid' over the last interval checkpoint and
            # needlessly replay that epoch's tail.  A zero-epoch fit (e.g.
            # resumed with num_epochs at/below the interrupted epoch) must
            # NOT delete the only snapshot holding the interrupted state.
            self.ckpt.remove("mid")
        self.logger.log("done", epochs=cfg.num_epochs,
                        total_s=time.time() - t0)
        self.ckpt.wait()
        return self.history.as_dict()

    def _maybe_save_best(self, epoch: int, eval_metrics: Dict[str, float],
                         train_avg: Dict[str, float]) -> bool:
        cfg = self.cfg.train
        key = cfg.best_metric
        value = eval_metrics.get(key, train_avg.get(key))
        if value is None or not np.isfinite(value):
            return False
        better = (self._best is None
                  or (cfg.best_mode == "max" and value > self._best)
                  or (cfg.best_mode == "min" and value < self._best))
        if better:
            self._best = value
            self.ckpt.save("best", self.state, history=self._ckpt_payload())
            self.logger.log("best_model", epoch=epoch, **{key: value})
        return better


def _to_jnp(batch: Dict[str, np.ndarray]):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()}


def _chunk_batches(loader, k: int, pad_multiple: int = 1):
    """Group equal-shaped host batches into stacked (K, B, ...) chunks for
    the scanned multi-step train call; odd-shaped and remainder batches pass
    through singly."""

    def gen():
        from cvad_tpu.runtime.mesh import pad_with_valid as _pad

        pending = []
        shape = None
        for batch in loader:
            batch = _pad(batch, pad_multiple)
            s = batch["clips"].shape
            if shape is not None and s != shape and pending:
                yield from pending  # shape changed: flush singles
                pending = []
            shape = s
            pending.append(batch)
            if len(pending) == k:
                yield {key: np.stack([b[key] for b in pending])
                       for key in pending[0]}
                pending = []
        yield from pending

    return gen()


def make_loaders(cfg: ExperimentConfig, n_synthetic: int = 256):
    """Convenience: (train_loader, eval_loader) from the data config."""
    from cvad_tpu.data.datasets import build_dataset

    train = build_dataset(cfg.data, "Train", n_synthetic)
    test = build_dataset(cfg.data, "Test", max(n_synthetic // 2, 2))
    bs = cfg.data.batch_size
    return (BatchLoader(train, bs, shuffle=True, seed=cfg.data.seed,
                        num_threads=cfg.data.num_decode_threads,
                        prefetch=cfg.data.prefetch,
                        transfer_dtype=cfg.data.transfer_dtype),
            BatchLoader(test, bs, shuffle=False,
                        num_threads=cfg.data.num_decode_threads,
                        prefetch=cfg.data.prefetch,
                        transfer_dtype=cfg.data.transfer_dtype))
