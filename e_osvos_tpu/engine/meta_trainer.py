"""Meta-training orchestrator (the rebuild of train_meta.py's main loop).

Reference flow (/root/reference/src/train_meta.py:129-377): build model +
MetaOptimizer, per-group RAdam, spawn eval + meta worker processes, then
loop: harvest eval metrics, barrier on the meta-shard workers, aggregate
shared-memory gradients, RAdam step, lr clamp, checkpoint every
vis_interval, best-J checkpoint from eval workers.

TPU-native: everything above collapses into a host loop around ONE jitted
SPMD step (parallel/meta_step.py). Tasks are sampled + decoded on host
(meta_optim/tasksets.py) while the device program runs; eval is a periodic
call into the one-shot evaluator with the current meta-params (the
reference's concurrent eval processes were a GPU-utilization workaround —
on a mesh the eval either time-multiplexes or takes a mesh slice).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np

from e_osvos_tpu.meta_optim import (
    MetaOptimConfig,
    MetaParams,
    init_meta_params,
)
from e_osvos_tpu.meta_optim.tasksets import MetaTaskset, MetaTasksetConfig
from e_osvos_tpu.parallel import (
    MetaStepConfig,
    OuterOptimConfig,
    make_mesh,
    make_meta_step,
    shard_task_batch,
)
from e_osvos_tpu.utils import MetricsLogger, Timer, load_checkpoint, save_checkpoint


@dataclasses.dataclass
class MetaTrainConfig:
    """Top-level meta-training knobs (cfgs/meta.yaml:1-13 equivalents)."""

    meta_batch_size: int = 4
    num_meta_iters: int = 1000
    vis_interval: int = 10  # checkpoint + log cadence (train_meta.py:277-286)
    eval_interval: int = 0  # 0 = no interleaved eval
    save_dir: Optional[str] = None
    seed: int = 1
    # jax.profiler trace of meta-iterations [start, stop) — the rebuild of
    # the reference's wall-clock-only tracing (SURVEY.md §5.1)
    profile_iters: Optional[tuple] = None
    profile_dir: str = "/tmp/e_osvos_tpu_profile"
    # increase sampling seed each epoch for generalization
    # (cfgs/meta.yaml:16 increase_seed_per_meta_run)
    increase_seed_per_meta_run: bool = True


class MetaTrainer:
    """Host-side driver for SPMD meta-training."""

    def __init__(
        self,
        model_apply: Callable,
        init_params: Any,
        taskset: MetaTaskset,
        meta_cfg: MetaOptimConfig = MetaOptimConfig(),
        step_cfg: MetaStepConfig = MetaStepConfig(),
        outer_cfg: OuterOptimConfig = OuterOptimConfig(),
        train_cfg: MetaTrainConfig = MetaTrainConfig(),
        mesh=None,
        logger: Optional[MetricsLogger] = None,
        eval_fn: Optional[Callable[[MetaParams, int], Dict]] = None,
        task_fns=None,
    ):
        self.taskset = taskset
        self.train_cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.logger = logger or MetricsLogger(
            path=(
                f"{train_cfg.save_dir}/metrics.jsonl" if train_cfg.save_dir else None
            )
        )
        self.eval_fn = eval_fn
        self.meta_params = init_meta_params(meta_cfg, init_params)
        # task_fns: architecture-specific (support_loss, query_loss) pair —
        # the detection family injects detection_task_fns(model, step_cfg)
        # here (parallel/meta_step.py:122); None = dense segmentation default
        self.step = make_meta_step(
            model_apply,
            meta_cfg,
            step_cfg,
            outer_cfg,
            self.mesh,
            train_cfg.meta_batch_size,
            task_fns=task_fns,
        )
        self.opt_state = self.step.init(self.meta_params)
        self.meta_iter = 0
        self.best_eval = -float("inf")
        self.timer = Timer()

    # -- checkpointing ------------------------------------------------------

    def _state(self):
        return {"meta_params": self.meta_params, "opt_state": self.opt_state}

    def save(self, name: str = "last_meta_iter"):
        if not self.train_cfg.save_dir:
            return None
        return save_checkpoint(
            f"{self.train_cfg.save_dir}/{name}.ckpt",
            self._state(),
            metadata={"meta_iter": self.meta_iter, "best_eval": self.best_eval},
        )

    def restore(self, path: str):
        state, meta = load_checkpoint(path, self._state())
        self.meta_params = state["meta_params"]
        self.opt_state = state["opt_state"]
        if meta:
            self.meta_iter = int(meta.get("meta_iter", 0))
            self.best_eval = float(meta.get("best_eval", -float("inf")))

    # -- training loop ------------------------------------------------------

    def run(self, num_iters: Optional[int] = None) -> Dict[str, Any]:
        """Pipelined host loop: jax dispatch is asynchronous, so iteration
        k+1's task sampling/decoding (host CPU) and batch upload overlap
        iteration k's device step — the metric fetch for k happens only
        AFTER k+1 has been dispatched (1-deep pipeline, ≤2 steps in
        flight). At logging/eval/final iterations the pipeline flushes so
        every logged value is exact for its own iteration. The reference
        gets the same overlap from separate eval/meta worker processes
        (train_meta.py:129-377); here it is one loop, no IPC."""
        cfg = self.train_cfg
        n = num_iters if num_iters is not None else cfg.num_meta_iters
        last: Dict[str, Any] = {}
        pending = None  # (meta_iter, out, sample_s, dispatch_t0)

        def finalize(p) -> Dict[str, Any]:
            it, out, sample_s, t0 = p
            loss = float(jax.device_get(out.meta_loss))
            return {
                "meta_loss": loss,
                "per_task_loss": np.asarray(
                    jax.device_get(out.per_task_loss)
                ).tolist(),
                "sample_s": sample_s,
                # dispatch→fetch wall time; under the pipeline this spans
                # the next iteration's sampling too, so it upper-bounds
                # the device step (exact on flushed iterations)
                "step_s": time.perf_counter() - t0,
            }

        for _ in range(n):
            if cfg.profile_iters is not None:
                if self.meta_iter == cfg.profile_iters[0]:
                    jax.profiler.start_trace(cfg.profile_dir)
                if self.meta_iter == cfg.profile_iters[1]:
                    jax.profiler.stop_trace()
            self.timer.start("sample")
            if cfg.increase_seed_per_meta_run:
                self.taskset.rng.seed(cfg.seed + self.meta_iter)
            batch = self.taskset.sample_batch(cfg.meta_batch_size)
            batch = shard_task_batch(self.mesh, batch)
            t_sample = self.timer.stop("sample")

            t0 = time.perf_counter()
            out = self.step(self.meta_params, self.opt_state, batch)
            self.meta_params = out.meta_params
            self.opt_state = out.opt_state
            self.meta_iter += 1

            if pending is not None:
                last = finalize(pending)
            pending = (self.meta_iter, out, t_sample, t0)

            flush = (
                self.meta_iter % cfg.vis_interval == 0
                or self.meta_iter == 1
                or (self.eval_fn is not None and cfg.eval_interval
                    and self.meta_iter % cfg.eval_interval == 0)
            )
            if flush:
                last = finalize(pending)
                pending = None

            if self.meta_iter % cfg.vis_interval == 0 or self.meta_iter == 1:
                # init-lr statistics — the numbers the reference plots as
                # lr mean/std curves (meta_optim.py:83-107, visualize.py)
                from e_osvos_tpu.meta_optim import lr_stats

                stats = lr_stats(
                    self.meta_params.log_init_lr,
                    use_log=self.step.meta_cfg.use_log_init_lr,
                )
                last["lr_mean"] = float(jax.device_get(stats["mean"]))
                last["lr_std"] = float(jax.device_get(stats["std"]))
                # per-tensor init-lr means — the reference's per-parameter
                # Visdom curves (visualize.py:107-118)
                from e_osvos_tpu.meta_optim import lr_per_tensor

                last["lr_per_tensor"] = lr_per_tensor(
                    self.meta_params.log_init_lr,
                    use_log=self.step.meta_cfg.use_log_init_lr,
                )
                self.logger.log("meta_train", step=self.meta_iter, **last)
                self.save("last_meta_iter")

            if (
                self.eval_fn is not None
                and cfg.eval_interval
                and self.meta_iter % cfg.eval_interval == 0
            ):
                ev = self.eval_fn(self.meta_params, self.meta_iter)
                self.logger.log("eval", step=self.meta_iter, **ev)
                score = ev.get("J_mean", -float("inf"))
                if score > self.best_eval:
                    self.best_eval = score
                    self.save("best_meta_iter")
        if pending is not None:
            last = finalize(pending)
        return last
