"""Batched AutoAttack evaluator sharded over the mesh.

Rebuild of the reference's evaluation stack (AA_eval.py + the autoattack
library it calls, SURVEY.md §3.3): standard AutoAttack = APGD-CE ->
APGD-T (9 targets, DLR-targeted) -> FAB-T -> Square, each attack run ONLY
on still-robust points (worklist semantics), robust accuracy re-scored on
the returned adversarial examples.

TPU design: attacks are jitted fixed-shape kernels; the worklist lives on
host as a boolean mask — between attacks we gather still-robust indices,
pad to the batch size, run the kernel, and scatter flipped points back.
ε-ball invariants are verified on every returned point (the reference's
check_imgs culture, utils_eval.py:67-81).

Multi-chip: the reference farms independent eval JOBS across free GPUs
(runner_aa_eval.py); the TPU-idiomatic equivalent is sharding ONE eval's
batch dimension over a device mesh (`AutoAttackConfig.mesh`) — every
attack kernel is per-sample independent, so XLA partitions it
embarrassingly-parallel over ICI with no code changes to the kernels.
The model params/captures must be replicated (or FSDP-sharded) over the
same mesh by the caller (cli/eval.py --shard_eval does this).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.apgd import apgd_attack
from ..ops.norms import check_imgs
from .fab import fab_single_chunk, fab_single_init
from .square import (
    square_attack_chunk,
    square_attack_finish,
    square_attack_init,
)

Array = jax.Array

# reference AA_eval.py:33
EPS_DICT = {"imagenet": {"Linf": 4.0 / 255.0, "L2": 2.0, "L1": 75.0}}

STANDARD_ATTACKS = ("apgd-ce", "apgd-t", "fab-t", "square")
SHORT_ATTACKS = ("apgd-ce", "apgd-t")  # reference full_aa=0 (AA_eval.py:230-231)


def shard_for_process(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round-robin shard of the eval set for THIS process (multi-host eval:
    each host attacks its own shard independently — the reference's GPU-farm
    job parallelism, runner_aa_eval.py, mapped to hosts). No-op when
    single-process."""
    n = jax.process_count()
    if n == 1:
        return x, y
    r = jax.process_index()
    return x[r::n], y[r::n]


def global_robust_accuracy(robust_local: np.ndarray) -> tuple[float, int]:
    """Sum per-process robust counts over all JAX processes. Returns
    (global robust accuracy, global example count); every rank gets the
    same numbers (the reference's torchmetrics dist_reduce_fx='sum' role,
    main.py:1155-1167, for the eval side)."""
    if jax.process_count() == 1:
        return float(robust_local.mean()), int(len(robust_local))
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(
        jnp.asarray([int(robust_local.sum()), int(len(robust_local))], jnp.int32)
    )
    tot = np.asarray(counts).reshape(-1, 2).sum(axis=0)
    return float(tot[0] / max(int(tot[1]), 1)), int(tot[1])


def _unit(xb: np.ndarray) -> np.ndarray:
    """[0,1] f32 pixels from a uint8 or already-unit-float batch. The eval
    set stays uint8 on host (4x smaller, 5000x224² ≈ 0.7 vs 2.8 GB) and is
    converted per dispatched batch."""
    if xb.dtype == np.uint8:
        return xb.astype(np.float32) / 255.0
    return np.asarray(xb, np.float32)


@dataclasses.dataclass
class AutoAttackConfig:
    norm: str = "Linf"
    eps: float = 4.0 / 255.0
    attacks_to_run: Sequence[str] = STANDARD_ATTACKS
    n_iter: int = 100
    n_target_classes: int = 9
    square_n_queries: int = 5000
    seed: int = 0
    batch_size: int = 200
    verbose: bool = True
    # Dispatch-duration bounds. One device program must stay ~1 minute at
    # the biggest shapes: the tunnel's TPU worker kills multi-minute
    # executions ("worker crashed", queue13 — FAB-T/Square at L@320 each
    # held 900/5000 model evals in ONE program; APGD, whose driver
    # dispatches per-target ~100-iteration programs, passed at the same
    # shape). Attacks are carry-resumable (fab_single_chunk /
    # square_attack_chunk), draws keyed on absolute iteration — chunked
    # trajectories are bit-identical to single-dispatch ones.
    fab_iter_chunk: int = 50  # FAB iterations per dispatch (per target)
    square_query_chunk: int = 500  # Square queries per dispatch
    # shard each dispatched batch's leading dim over this mesh's ("data",
    # "fsdp") axes — single-eval multi-chip parallelism (None: one device).
    # Single-controller meshes only: batches are device_put from one host
    # (multi-host pods would need make_array_from_process_local_data).
    mesh: "jax.sharding.Mesh | None" = None


class AutoAttack:
    """`AutoAttack(logits_fn, cfg).run_standard_evaluation(x, y)` -> x_adv.

    Two calling conventions:
      * variables=None (closure mode, tests/micro models): logits_fn is
        (batch NHWC [0,1]) -> logits [B, C], closed over the params.
      * variables=<pytree> (production): logits_fn is (variables, batch) ->
        logits and `variables` is passed as a JIT ARGUMENT to every attack
        program. Closure-captured concrete params are INLINED into the
        lowered module as literal constants — for ConvNeXt-L that is
        ~800 MB of StableHLO, which bursts the tunnel's remote-compile
        request cap (HTTP 413), slows server-side compiles, and keys the
        persistent compile cache on the checkpoint contents. Argument
        params keep the module at graph-size (~2 MB) and cache-stable.
    """

    def __init__(self, logits_fn: Callable, cfg: AutoAttackConfig,
                 logger=None, variables=None):
        self.cfg = cfg
        if logger is not None:
            self.log = logger.log
        elif cfg.verbose:
            self.log = print
        else:
            self.log = lambda *a, **k: None
        if variables is None:
            self._v = ()
            vfn = lambda v, xb: logits_fn(xb)  # noqa: E731
        else:
            self._v = variables
            vfn = logits_fn
        self._vfn = vfn
        self._jit_logits = jax.jit(vfn)

        if cfg.mesh is not None:
            from ..parallel.mesh import batch_shard_count, batch_sharding

            n_shards = batch_shard_count(cfg.mesh)
            assert cfg.batch_size % n_shards == 0, (
                f"batch_size {cfg.batch_size} must divide over the "
                f"{n_shards} batch shards of the mesh"
            )
            self._batch_sharding = batch_sharding(cfg.mesh)
        else:
            self._batch_sharding = None

        n_iter = cfg.n_iter

        @jax.jit
        def _apgd_ce(v, x, y, rng):
            res = apgd_attack(
                partial(vfn, v), x, y, norm=cfg.norm, eps=cfg.eps, n_iter=n_iter,
                loss="ce", is_train=False, rng=rng, random_start=True,
            )
            return res.x_best_adv, res.acc

        @jax.jit
        def _apgd_t(v, x, y, y_target, rng):
            res = apgd_attack(
                partial(vfn, v), x, y, norm=cfg.norm, eps=cfg.eps, n_iter=n_iter,
                loss="dlr-targeted", y_target=y_target, is_train=False,
                rng=rng, random_start=True,
            )
            return res.x_best_adv, res.acc

        # fab/square run as bounded-duration chunk programs with the carry
        # threaded through host-level calls (see the cfg chunk fields).
        # `v` as a jit argument hoists the params out of the module; it0 /
        # n_valid are traced scalars so ONE compiled chunk program serves
        # every chunk position and budget.
        fab_chunk = max(1, min(cfg.fab_iter_chunk, n_iter))

        @jax.jit
        def _fab_chunk(v, x, y, y_target, carry, n_valid):
            return fab_single_chunk(
                partial(vfn, v), x, y, y_target, carry, fab_chunk, n_valid,
                norm=cfg.norm,
            )

        sq_chunk = max(1, min(cfg.square_query_chunk, cfg.square_n_queries - 1))

        @jax.jit
        def _square_init(v, x, y, rng):
            return square_attack_init(
                partial(vfn, v), x, y, norm=cfg.norm, eps=cfg.eps, rng=rng
            )

        @jax.jit
        def _square_chunk(v, x, y, carry, it0, n_valid, rng):
            return square_attack_chunk(
                partial(vfn, v), x, y, carry, it0, sq_chunk, n_valid,
                norm=cfg.norm, eps=cfg.eps, rng=rng,
            )

        self._apgd_ce = _apgd_ce
        self._apgd_t = _apgd_t
        self._fab_chunk_fn = _fab_chunk
        self._fab_chunk = fab_chunk
        self._square_init = _square_init
        self._square_chunk_fn = _square_chunk
        self._sq_chunk = sq_chunk

    # ----------------------------------------------------------- utilities
    def _dev(self, a) -> Array:
        """Batch array -> device: sharded over the mesh's batch axes when
        cfg.mesh is set (each attack kernel is per-sample independent, so
        the XLA partitioner runs it data-parallel), else default placement."""
        a = jnp.asarray(a)
        if self._batch_sharding is not None:
            a = jax.device_put(a, self._batch_sharding)
        return a

    def _dev_x(self, xb) -> Array:
        """Pixel batch -> device as [0,1] f32: uint8 crosses the host↔device
        link at 1 B/px and converts on device (4x less transfer than
        converting on host — the tunnel makes H2D the eval bottleneck)."""
        xb = self._dev(xb)
        if xb.dtype == jnp.uint8:
            xb = xb.astype(jnp.float32) / 255.0
        return xb

    def clean_accuracy(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Per-point correctness, batched (robustbench clean_accuracy role)."""
        bs = self.cfg.batch_size
        out = np.zeros(len(x), bool)
        for i in range(0, len(x), bs):
            xb, yb, n = self._pad(x[i : i + bs], y[i : i + bs])
            logits = np.asarray(self._jit_logits(self._v, self._dev_x(xb)))
            out[i : i + n] = logits.argmax(-1)[:n] == yb[:n]
        return out

    def _pad(self, xb, yb):
        """Pad to the fixed batch size; pixels stay in their host dtype
        (uint8 preferred — _dev ships 1 B/px over the host↔device link and
        converts to [0,1] f32 on device)."""
        n = len(xb)
        bs = self.cfg.batch_size
        if n < bs:
            xb = np.concatenate([xb, np.repeat(xb[-1:], bs - n, axis=0)])
            yb = np.concatenate([yb, np.repeat(yb[-1:], bs - n, axis=0)])
        return xb, yb, n

    def _top_target_classes(self, x: np.ndarray) -> np.ndarray:
        """[N, n_target_classes] target labels: 2nd..k-th most likely class."""
        bs = self.cfg.batch_size
        k = self.cfg.n_target_classes
        out = np.zeros((len(x), k), np.int32)
        for i in range(0, len(x), bs):
            xb = x[i : i + bs]
            n = len(xb)
            xb, _, _ = self._pad(xb, np.zeros(len(xb), np.int32))
            logits = np.asarray(self._jit_logits(self._v, self._dev_x(xb)))[:n]
            order = np.argsort(logits, axis=-1)  # ascending
            out[i : i + n] = order[:, -2 : -2 - k : -1]  # 2nd ... (k+1)-th
        return out

    # -------------------------------------------------------------- driver
    def run_standard_evaluation(
        self, x: np.ndarray, y: np.ndarray, out_path=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (x_adv, robust_mask). x NHWC: uint8 [0,255] (preferred —
        stays 4x smaller on host until batch dispatch) or float32 [0,1].

        Host-memory contract (VERDICT r4 weak#8): during the attack phase
        only the FLIPPED points are held in f32 (a sparse dict) — the eval
        set itself stays in its input dtype. The full f32 x_adv is assembled
        batchwise at the very end; with `out_path` (a .npy path) it is
        assembled into a numpy memmap so the 4x f32 copy never resides in
        RAM at all (5000x224²: ~0.7 GB uint8 + flips, vs 3.5 GB before)."""
        cfg = self.cfg
        x = np.asarray(x)
        y = np.asarray(y, np.int64)
        store: dict[int, np.ndarray] = {}  # idx -> f32 adversarial point

        robust = self.clean_accuracy(x, y)
        self.log(f"initial (clean) accuracy: {robust.mean():.2%}")

        rng = jax.random.PRNGKey(cfg.seed)

        for attack_idx, attack in enumerate(cfg.attacks_to_run):
            idx = np.where(robust)[0]
            if len(idx) == 0:
                break
            flipped_x, flipped_mask = self._run_attack(
                attack, x[idx], y[idx], jax.random.fold_in(rng, attack_idx)
            )
            newly_broken = idx[flipped_mask]
            for j, pt in zip(newly_broken, flipped_x):
                store[int(j)] = pt
            robust[newly_broken] = False
            self.log(
                f"robust accuracy after {attack.upper()}: {robust.mean():.2%} "
                f"(broke {flipped_mask.sum()}/{len(idx)})"
            )

        def batch_adv(i, j):
            """f32 x_adv[i:j] assembled from the input batch + flip overrides."""
            xb = _unit(x[i:j])
            if xb.base is not None:  # f32 input: _unit returns a view of x —
                xb = xb.copy()       # never write flips into the clean set
            for k in range(i, min(j, len(x))):
                if k in store:
                    xb[k - i] = store[k]
            return xb

        # ε-ball + range invariants on every adversarial point (check_imgs),
        # batched: never ships the whole eval set to the device at once
        bs = cfg.batch_size
        max_norm, lo, hi = 0.0, np.inf, -np.inf
        for i in range(0, len(x), bs):
            mn, l, h = check_imgs(
                jnp.asarray(batch_adv(i, i + bs)),
                jnp.asarray(_unit(x[i : i + bs])),
                cfg.norm,
            )
            max_norm = max(max_norm, float(mn))
            lo, hi = min(lo, float(l)), max(hi, float(h))
        self.log(
            f"max {cfg.norm} perturbation: {max_norm:.5f}, "
            f"image range [{lo:.5f}, {hi:.5f}]"
        )
        assert max_norm <= cfg.eps * 1.001 + 1e-6, "eps-ball violated"

        # re-score batchwise (reference AA_eval.py:241-243 re-checks with
        # clean_accuracy) — still never assembles the full f32 set
        rescored = np.zeros(len(x), bool)
        for i in range(0, len(x), bs):
            xb, yb, n = self._pad(batch_adv(i, i + bs), y[i : i + bs])
            logits = np.asarray(self._jit_logits(self._v, self._dev_x(xb)))
            rescored[i : i + n] = logits.argmax(-1)[:n] == yb[:n]
        self.log(f"robust accuracy (re-scored on x_adv): {rescored.mean():.2%}")

        # final assembly, batchwise: into a disk-backed memmap when out_path
        # is given (--save_imgs), else into one RAM array returned to the
        # caller (allocated only now, after the attack phase)
        shape = (len(x),) + tuple(x.shape[1:])
        if out_path is not None:
            x_adv = np.lib.format.open_memmap(
                str(out_path), mode="w+", dtype=np.float32, shape=shape
            )
        else:
            x_adv = np.empty(shape, np.float32)
        for i in range(0, len(x), bs):
            x_adv[i : i + bs] = batch_adv(i, i + bs)
        if out_path is not None:
            x_adv.flush()
        return x_adv, robust

    # ------------------------------------------------------- attack kernels
    def _run_attack(self, attack: str, x: np.ndarray, y: np.ndarray, rng):
        """Run one attack over the worklist subset (x may be uint8; batches
        convert at dispatch). Returns (flipped_imgs f32 [n_flipped, ...] in
        np.where(flipped)[0] order, flipped bool mask aligned with x) —
        only broken points are materialized in float."""
        cfg = self.cfg
        bs = cfg.batch_size
        n = len(x)
        store: dict[int, np.ndarray] = {}
        flipped = np.zeros(n, bool)

        def _keep(i, got, adv):
            for j in np.where(got)[0]:
                store[i + int(j)] = adv[j]

        for i in range(0, n, bs):
            xb, yb, nb = self._pad(x[i : i + bs], y[i : i + bs])
            xb_j, yb_j = self._dev_x(xb), self._dev(yb)
            kb = jax.random.fold_in(rng, i)

            if attack == "apgd-ce":
                adv, acc = self._apgd_ce(self._v, xb_j, yb_j, kb)
                adv, acc = np.asarray(adv), np.asarray(acc)
                got = ~acc[:nb]
                _keep(i, got, adv[:nb])
                flipped[i : i + nb] |= got

            elif attack == "apgd-t":
                targets = self._top_target_classes(xb)
                still = np.ones(nb, bool)
                for t in range(cfg.n_target_classes):
                    if not still.any():
                        break
                    yt = self._dev(targets[:, t].astype(np.int64))
                    adv, acc = self._apgd_t(self._v, xb_j, yb_j, yt, jax.random.fold_in(kb, t))
                    adv, acc = np.asarray(adv), np.asarray(acc)
                    got = (~acc[:nb]) & still
                    _keep(i, got, adv[:nb])
                    flipped[i : i + nb] |= got
                    still &= acc[:nb]

            elif attack == "fab-t":
                # per-target, per-chunk dispatches (bounded duration); best
                # minimum-norm point over all targets, exactly as
                # fab_attack_targeted's one-program scan computes it
                targets = self._top_target_classes(xb)
                xb_f = np.asarray(xb_j, np.float32)
                best_x = xb_f.copy()
                best_res = np.full(len(xb_f), 1e10, np.float32)
                n_it = cfg.n_iter
                for t in range(cfg.n_target_classes):
                    yt = self._dev(targets[:, t].astype(np.int64))
                    carry = tuple(
                        self._dev(a) for a in fab_single_init(xb_f)
                    )
                    done = 0
                    while done < n_it:
                        nv = min(self._fab_chunk, n_it - done)
                        carry = self._fab_chunk_fn(
                            self._v, xb_j, yb_j, yt, carry, jnp.int32(nv)
                        )
                        done += nv
                    xb_t, res = np.asarray(carry[1]), np.asarray(carry[2])
                    better = res < best_res
                    best_x[better] = xb_t[better]
                    best_res[better] = res[better]
                success = best_res <= cfg.eps
                got = success[:nb]
                _keep(i, got, best_x[:nb])
                flipped[i : i + nb] |= got

            elif attack == "square":
                carry = self._square_init(self._v, xb_j, yb_j, kb)
                n_q = cfg.square_n_queries - 1  # init consumed 1 query
                it0 = 0
                while it0 < n_q:
                    carry = self._square_chunk_fn(
                        self._v, xb_j, yb_j, carry,
                        jnp.int32(it0), jnp.int32(n_q), kb,
                    )
                    it0 += self._sq_chunk
                adv, acc = square_attack_finish(carry)
                adv, acc = np.asarray(adv), np.asarray(acc)
                got = ~acc[:nb]
                _keep(i, got, adv[:nb])
                flipped[i : i + nb] |= got

            else:
                raise ValueError(f"unknown attack {attack!r}")

        flipped_idx = np.where(flipped)[0]
        if len(flipped_idx):
            flipped_imgs = np.stack([store[int(j)] for j in flipped_idx])
        else:
            flipped_imgs = np.zeros((0,) + tuple(x.shape[1:]), np.float32)
        return flipped_imgs, flipped
