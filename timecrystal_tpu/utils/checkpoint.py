"""Checkpoint / resume for long evolutions and sweeps.

The reference has NO checkpointing (SURVEY.md section 5: h5py declared but
never imported; states only live in RAM).  Long phase sweeps and ensembles
need it on TPU: this module persists the MPS pytree, disorder fields, RNG
state, and sweep progress via orbax (falling back to .npz when orbax is
unavailable), so a killed sweep resumes at the last completed shard.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mps import MPS
from ..ops.cpx import C


def _mps_to_arrays(psi: MPS) -> Dict[str, np.ndarray]:
    return {"B_re": np.asarray(psi.B.re), "B_im": np.asarray(psi.B.im),
            "lam": np.asarray(psi.lam)}


def _mps_from_arrays(d: Dict[str, np.ndarray], dtype=None) -> MPS:
    dt = dtype or d["B_re"].dtype
    return MPS(B=C(jnp.asarray(d["B_re"], dt), jnp.asarray(d["B_im"], dt)),
               lam=jnp.asarray(d["lam"], dt))


def _orbax_checkpointer():
    try:
        import orbax.checkpoint as ocp
        return ocp.PyTreeCheckpointer()
    except Exception:
        return None


def save_state(path: str, psi: MPS, metadata: Dict[str, Any] | None = None,
               format: str = "auto") -> None:
    """Persist an MPS + JSON-serializable metadata (h_fields, period index,
    RNG keys as lists, trunc params...).

    format: 'orbax' (directory checkpoint at <path>.orbax), 'npz'
    (single compressed file at <path>.npz), or 'auto' = orbax when
    installed, npz otherwise.  ``load_state`` auto-detects either.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = _mps_to_arrays(psi)
    meta = json.dumps(metadata or {})
    ckptr = _orbax_checkpointer() if format in ("auto", "orbax") else None
    if format == "orbax" and ckptr is None:
        raise RuntimeError("orbax requested but not importable")
    if ckptr is not None:
        # crash-safe install: write the new checkpoint to <target>.tmp,
        # RENAME (not rmtree) the previous one aside to <target>.old, swap
        # the tmp in, then drop the old.  Every kill window leaves a
        # complete checkpoint on disk: before the first rename it's
        # <target>; between the renames it's <target>.old (which
        # load_state/state_exists fall back to); after the swap it's the
        # new <target>.  A bare rmtree(target)+replace had a window with
        # NO complete checkpoint (the .tmp a kill mid-save leaves behind
        # cannot be trusted).
        target = os.path.abspath(path) + ".orbax"
        tmp = target + ".tmp"
        old = target + ".old"
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
        ckptr.save(tmp, {**arrays,
                         "__meta__": np.frombuffer(meta.encode(), np.uint8)
                         .copy()})
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(target):
            os.replace(target, old)
        os.replace(tmp, target)
        shutil.rmtree(old, ignore_errors=True)
        # drop a superseded npz at the same path: load_state would
        # otherwise have two formats with no way to know which is newer
        npz_twin = path if path.endswith(".npz") else path + ".npz"
        if os.path.exists(npz_twin):
            os.remove(npz_twin)
        return
    target = path if path.endswith(".npz") else path + ".npz"
    tmp = target + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, __meta__=np.frombuffer(meta.encode(), np.uint8),
                            **arrays)
    os.replace(tmp, target)
    # drop a superseded orbax checkpoint at the same path (e.g. the caller
    # switched formats, or orbax broke mid-project): a stale .orbax dir
    # used to SHADOW the newer npz on load -- silently restoring old state
    # or refusing to resume when orbax was no longer importable
    import shutil
    orbax_twin = os.path.abspath(path) + ".orbax"
    shutil.rmtree(orbax_twin + ".old", ignore_errors=True)
    shutil.rmtree(orbax_twin, ignore_errors=True)


def load_state(path: str, dtype=None):
    """Returns (MPS, metadata dict); auto-detects orbax vs npz layout.

    Falls back to <path>.orbax.old when <path>.orbax is absent: that is
    the previous checkpoint a kill inside save_state's install swap can
    leave behind (see save_state)."""
    orbax_path = (path if path.endswith(".orbax")
                  else os.path.abspath(path) + ".orbax")
    if not os.path.isdir(orbax_path) and os.path.isdir(orbax_path + ".old"):
        orbax_path = orbax_path + ".old"
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if (os.path.isdir(orbax_path) and os.path.exists(npz_path)
            and os.path.getmtime(npz_path) >= os.path.getmtime(orbax_path)):
        # both formats present (kill between an npz install and the orbax
        # twin removal): the newer one wins instead of orbax shadowing
        orbax_path = ""
    if os.path.isdir(orbax_path):
        ckptr = _orbax_checkpointer()
        if ckptr is None:
            raise RuntimeError(f"{orbax_path} exists but orbax not importable")
        z = ckptr.restore(orbax_path)
        meta = json.loads(bytes(np.asarray(z["__meta__"],
                                           dtype=np.uint8)).decode()) \
            if "__meta__" in z else {}
        psi = _mps_from_arrays({k: np.asarray(z[k])
                                for k in ("B_re", "B_im", "lam")}, dtype)
        return psi, meta
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        psi = _mps_from_arrays({k: z[k] for k in ("B_re", "B_im", "lam")}, dtype)
    return psi, meta


def atomic_savez(path: str, **arrays) -> None:
    """np.savez_compressed with write-to-temp + os.replace: a kill mid-write
    never leaves a truncated zip at ``path`` (the chi-staged drivers write
    trace chunks with this BEFORE the state checkpoint, so any surviving
    pair is self-consistent)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)


def state_exists(path: str) -> bool:
    """True when either checkpoint layout exists at ``path`` (including a
    .orbax.old left by a kill mid-install; load_state reads it)."""
    base = os.path.abspath(path) + ".orbax"
    return (os.path.isdir(base) or os.path.isdir(base + ".old")
            or os.path.exists(path if path.endswith(".npz") else path + ".npz"))


class SweepCheckpointer:
    """Incremental checkpointing for grid sweeps: per-chunk trace results
    plus a manifest, so interrupted sweeps resume at the next chunk.

    ``fingerprint``: anything that must MATCH between the original run and
    a resume (grid, params, chunk size).  A manifest written with a
    different fingerprint makes ``completed_chunks`` raise instead of
    silently mixing misaligned chunks into the result."""

    def __init__(self, directory: str, fingerprint: str | None = None):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.manifest_path = os.path.join(directory, "manifest.json")
        self.fingerprint = fingerprint

    def _manifest(self) -> Dict:
        if not os.path.exists(self.manifest_path):
            return {}
        with open(self.manifest_path) as f:
            return json.load(f)

    def completed_chunks(self) -> set:
        man = self._manifest()
        ck_fp = man.get("fingerprint")
        if (self.fingerprint is not None and ck_fp is not None
                and ck_fp != self.fingerprint):
            raise ValueError(
                f"sweep checkpoint at {self.dir} was written by a run with "
                "different parameters (grid/params/chunking); refusing to "
                "resume -- delete it or point elsewhere")
        return set(man.get("chunks", []))

    def save_chunk(self, chunk_id: int, traces: Dict[str, np.ndarray],
                   extra: Dict | None = None) -> None:
        # chunk npz AND manifest installed atomically (temp + os.replace):
        # a kill mid-write used to leave a truncated manifest.json that
        # crashed every subsequent resume in completed_chunks()
        atomic_savez(os.path.join(self.dir, f"chunk_{chunk_id:05d}.npz"),
                     **{k: np.asarray(v) for k, v in traces.items()})
        done = self.completed_chunks() | {chunk_id}
        man = {"chunks": sorted(done), "extra": extra or {}}
        if self.fingerprint is not None:
            man["fingerprint"] = self.fingerprint
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self.manifest_path)

    def load_chunk(self, chunk_id: int) -> Dict[str, np.ndarray]:
        with np.load(os.path.join(self.dir, f"chunk_{chunk_id:05d}.npz")) as z:
            return {k: z[k] for k in z.files}
