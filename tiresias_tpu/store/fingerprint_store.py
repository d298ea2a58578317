"""HBM-resident fingerprint store + host-side catalog.

TPU-first replacement for the reference's storage layer — the in-memory
SQLite database (``":memory:"``, /root/reference/src/fp_handler.c:30) holding
``context_list`` / ``audio_list`` / ``audio_fingerprint`` tables
(/root/reference/src/fp_handler.c:673-756) behind the db_ctx abstraction
(/root/reference/src/db_ctx_handler.c). Per-frame SQL rows become one dense
matrix; the catalog (uuid/name/context/md5) stays on host as plain Python.

Layout:
  * ``matrix`` — float32 ``[capacity_audios, frame_cap, n_coefs]``, one row
    block per audio, ``PAD_VALUE`` beyond each audio's ``n_frames`` (no
    tolerance band can ever match padding).
  * ``entries`` — ordered list of :class:`AudioEntry`; list index == matrix
    row. Replaces the ``audio_list`` table (uuid, name, context, hash —
    /root/reference/src/fp_handler.c:700-706).
  * ``contexts`` — name → directory dict, replacing ``context_list``
    (/root/reference/src/fp_handler.c:686-692).

Capacities grow geometrically and the device view is padded to fixed buckets
so ``jit`` recompiles stay bounded as the store grows.

Checkpointing replaces the SQLite online-backup/restore pair
(/root/reference/src/db_ctx_handler.c:673-717, 750-772): an atomic
write-to-tmp + rename of ``catalog.json`` + ``fingerprints.npz``. Unlike the
reference — which persists only at clean unload, losing everything on a crash
(/root/reference/src/fp_handler.c:97-103) — callers checkpoint after each
ingest batch (PARITY.md D2).
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
from typing import Iterable

import numpy as np

from tiresias_tpu.config import DEF_N_COEFS
from tiresias_tpu.ops.mfcc_jax import PAD_VALUE
from tiresias_tpu.utils.hashing import generate_uuid
from tiresias_tpu.utils.logging import get_logger

log = get_logger(__name__)

CHECKPOINT_VERSION = 1
CATALOG_FILE = "catalog.json"
MATRIX_FILE = "fingerprints.npz"

# Device-view padding buckets: audio axis to multiples of 128 (one Pallas
# match block), frame axis grows geometrically.
AUDIO_BUCKET = 128
FRAME_BUCKET = 128


@dataclasses.dataclass
class AudioEntry:
    """One ``audio_list`` row (/root/reference/src/fp_handler.c:700-706)."""

    uuid: str
    name: str
    context: str
    hash: str
    n_frames: int

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "AudioEntry":
        return AudioEntry(
            uuid=d["uuid"],
            name=d["name"],
            context=d["context"],
            hash=d["hash"],
            n_frames=int(d["n_frames"]),
        )


class CheckpointIncompatible(ValueError):
    """A checkpoint that is structurally valid but cannot be loaded into
    this store (version or n_coefs mismatch) — fails loudly instead of
    silently falling back a generation."""


def _bucket(n: int, multiple: int) -> int:
    return max(multiple, -(-n // multiple) * multiple)


class FingerprintStore:
    """Dense fingerprint matrix + catalog with reference CRUD semantics.

    Thread safety: a single re-entrant lock guards all mutation and catalog
    reads — the moral equivalent of the reference's SQLite busy handler
    (/root/reference/src/db_ctx_handler.c:122-140) without the retry loop.
    """

    def __init__(self, n_coefs: int = DEF_N_COEFS, mesh=None) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``db`` axis; when
        set, the device view is placed with a ``P('db')`` NamedSharding so
        every jitted consumer (lattice matmul, matcher) auto-partitions the
        audio axis across chips via GSPMD — no code changes downstream."""
        self.n_coefs = int(n_coefs)
        self.mesh = mesh
        self._lock = threading.RLock()
        self.entries: list[AudioEntry] = []
        self.contexts: dict[str, str] = {}  # name -> directory
        self._matrix = np.full((0, 0, self.n_coefs), PAD_VALUE, dtype=np.float32)
        self._device_db = None  # cached (db, mask, n_audios) jax arrays
        self._view_entries: list[AudioEntry] = []  # catalog at view-build time
        self._value_map = None  # cached lattice map [A_pad, K] (match_lattice)
        self._hash_index: dict[tuple[str, str], AudioEntry] = {}  # (ctx, md5)
        self._dirty = True

    # ------------------------------------------------------------------ #
    # context CRUD (fp_create_context_list_info / fp_delete_context_list_info,
    # /root/reference/src/fp_handler.c:912-1095)
    # ------------------------------------------------------------------ #

    def create_context(self, name: str, directory: str = "") -> None:
        if not name:
            raise ValueError("context name required")
        with self._lock:
            self.contexts[name] = directory

    def get_context(self, name: str) -> dict | None:
        with self._lock:
            if name not in self.contexts:
                return None
            return {"name": name, "directory": self.contexts[name]}

    def get_contexts_all(self) -> list[dict]:
        """``context_list`` rows (fp_get_context_lists_all, fp_handler.c:414)."""
        with self._lock:
            return [{"name": n, "directory": d} for n, d in self.contexts.items()]

    def delete_context(self, name: str) -> bool:
        """Delete a context and all its audios
        (fp_delete_context_list_info, /root/reference/src/fp_handler.c:1039)."""
        with self._lock:
            if name not in self.contexts:
                return False
            doomed = [e.uuid for e in self.entries if e.context == name]
            for uuid in doomed:
                self._delete_audio_locked(uuid)
            del self.contexts[name]
            return True

    # ------------------------------------------------------------------ #
    # audio CRUD (fp_handler.c:115-197, 479-575)
    # ------------------------------------------------------------------ #

    def find_by_hash(self, context: str, file_hash: str) -> AudioEntry | None:
        """MD5 dedupe lookup (/root/reference/src/fp_handler.c:494-507,758-805).

        O(1) via a (context, hash) index — the analogue of the reference's
        audio_list indexes (fp_handler.c:736-753)."""
        with self._lock:
            return self._hash_index.get((context, file_hash))

    def add_audio(
        self,
        name: str,
        context: str,
        fingerprint: np.ndarray,
        file_hash: str,
        uuid: str | None = None,
        dedupe: bool = True,
    ) -> AudioEntry | None:
        """Insert one audio's fingerprint; returns None when deduped.

        Mirrors fp_craete_audio_list_info [sic] →
        create_audio_list_info + create_audio_fingerprint_info
        (/root/reference/src/fp_handler.c:161-197,479-575), with the per-frame
        INSERT loop replaced by one block write.
        """
        fingerprint = np.asarray(fingerprint, dtype=np.float32)
        if fingerprint.ndim != 2 or fingerprint.shape[1] < self.n_coefs:
            raise ValueError(
                f"fingerprint must be [n_frames, >= {self.n_coefs}] "
                f"(got {fingerprint.shape})"
            )
        with self._lock:
            if context not in self.contexts:
                raise KeyError(f"unknown context {context!r}")
            if dedupe and self.find_by_hash(context, file_hash) is not None:
                return None
            entry = AudioEntry(
                uuid=uuid or generate_uuid(),
                name=name,
                context=context,
                hash=file_hash,
                n_frames=int(fingerprint.shape[0]),
            )
            row = len(self.entries)
            self._ensure_capacity(row + 1, entry.n_frames)
            self._matrix[row] = PAD_VALUE
            self._matrix[row, : entry.n_frames] = fingerprint[:, : self.n_coefs]
            self.entries.append(entry)
            self._hash_index[(context, file_hash)] = entry
            self._dirty = True
            return entry

    def get_audio(self, uuid: str) -> AudioEntry | None:
        with self._lock:
            for e in self.entries:
                if e.uuid == uuid:
                    return e
            return None

    def get_audios_by_context(self, context: str) -> list[AudioEntry]:
        """fp_get_audio_lists_by_contextname (/root/reference/src/fp_handler.c:441)."""
        with self._lock:
            return [e for e in self.entries if e.context == context]

    def get_fingerprint(self, uuid: str) -> np.ndarray | None:
        with self._lock:
            for i, e in enumerate(self.entries):
                if e.uuid == uuid:
                    return self._matrix[i, : e.n_frames].copy()
            return None

    def delete_audio(self, uuid: str) -> bool:
        """fp_delete_audio_list_info: removes the catalog row and all its
        fingerprint frames (/root/reference/src/fp_handler.c:115-159)."""
        with self._lock:
            return self._delete_audio_locked(uuid)

    def _delete_audio_locked(self, uuid: str) -> bool:
        for i, e in enumerate(self.entries):
            if e.uuid == uuid:
                # compact: shift following rows up to keep index == row
                self._matrix[i:-1] = self._matrix[i + 1 :]
                if len(self._matrix):
                    self._matrix[-1] = PAD_VALUE
                del self.entries[i]
                self._hash_index.pop((e.context, e.hash), None)
                self._dirty = True
                return True
        return False

    # ------------------------------------------------------------------ #
    # matrix / device view
    # ------------------------------------------------------------------ #

    def __len__(self) -> int:
        return len(self.entries)

    @property
    def frame_cap(self) -> int:
        return self._matrix.shape[1]

    def _ensure_capacity(self, n_audios: int, n_frames: int) -> None:
        cap_a, cap_t, _ = self._matrix.shape
        new_a = cap_a
        while new_a < n_audios:
            new_a = max(AUDIO_BUCKET, new_a * 2)
        new_t = cap_t
        while new_t < n_frames:
            new_t = max(FRAME_BUCKET, new_t * 2)
        if (new_a, new_t) != (cap_a, cap_t):
            grown = np.full((new_a, new_t, self.n_coefs), PAD_VALUE, dtype=np.float32)
            grown[:cap_a, :cap_t] = self._matrix
            self._matrix = grown

    def host_db(self) -> tuple[np.ndarray, np.ndarray]:
        """(db [A, T, C], mask [A, T]) numpy views of the live slice."""
        with self._lock:
            a = len(self.entries)
            t = self.frame_cap
            db = self._matrix[:a]
            n_frames = np.array([e.n_frames for e in self.entries], dtype=np.int32)
            mask = np.arange(t)[None, :] < n_frames[:, None]
            return db, mask

    def device_db(self):
        """Bucket-padded device arrays (db [A_pad, T, C], mask [A_pad, T],
        n_audios int). Cached until the store mutates; padding keeps jit
        recompiles bounded as audios are added."""
        import jax.numpy as jnp

        with self._lock:
            if not self._dirty and self._device_db is not None:
                return self._device_db
            a = len(self.entries)
            a_pad = _bucket(a, AUDIO_BUCKET)
            if self.mesh is not None:
                n_db = self.mesh.shape.get("db", 1)
                a_pad = _bucket(a_pad, AUDIO_BUCKET * n_db)
            t = max(self.frame_cap, FRAME_BUCKET)
            db = np.full((a_pad, t, self.n_coefs), PAD_VALUE, dtype=np.float32)
            if a:
                db[:a, : self.frame_cap] = self._matrix[:a]
            n_frames = np.zeros(a_pad, dtype=np.int32)
            n_frames[:a] = [e.n_frames for e in self.entries]
            mask = np.arange(t)[None, :] < n_frames[:, None]
            if self.mesh is not None:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec

                db_j = jax.device_put(
                    db, NamedSharding(self.mesh, PartitionSpec("db", None, None))
                )
                mask_j = jax.device_put(
                    mask, NamedSharding(self.mesh, PartitionSpec("db", None))
                )
            else:
                db_j, mask_j = jnp.asarray(db), jnp.asarray(mask)
            self._device_db = (db_j, mask_j, a)
            self._view_entries = list(self.entries)
            self._value_map = None  # rebuilt lazily from the new view
            self._dirty = False
            return self._device_db

    def device_value_map(self):
        """Cached lattice distance map ``M [A_pad, K]`` for the MXU search
        fast path (:mod:`tiresias_tpu.ops.match_lattice`); rebuilt only when
        the store mutates. The whole check-and-build runs under the store
        lock (re-entrant) so a concurrent mutation between the device-view
        fetch and the build cannot cache a stale map."""
        from tiresias_tpu.ops.match_lattice import build_value_map

        with self._lock:
            db, mask, n_audios = self.device_db()
            if self._value_map is None:
                self._value_map = build_value_map(db[..., 0], mask)
            return self._value_map, n_audios

    def view_entries(self) -> list[AudioEntry]:
        """Catalog snapshot matching the cached device view's row order —
        result attribution must use THIS, not the live catalog, since a
        concurrent delete compacts rows and shifts indices."""
        with self._lock:
            if self._dirty or self._device_db is None:
                self.device_db()
            return self._view_entries

    def context_filter(self, context: str | None) -> np.ndarray | None:
        """Bool ``[A_pad]`` selecting a context's audios in the device view,
        or None for the reference's scan-everything behavior (PARITY.md D7)."""
        if context is None:
            return None
        with self._lock:
            a_pad = _bucket(len(self.entries), AUDIO_BUCKET)
            if self.mesh is not None:
                n_db = self.mesh.shape.get("db", 1)
                a_pad = _bucket(a_pad, AUDIO_BUCKET * n_db)
            flt = np.zeros(a_pad, dtype=bool)
            for i, e in enumerate(self.entries):
                flt[i] = e.context == context
            return flt

    # ------------------------------------------------------------------ #
    # checkpoint / resume (db_ctx_backup / db_ctx_load_db_data equivalents)
    # ------------------------------------------------------------------ #

    def save(self, directory: str) -> None:
        """Atomic, versioned checkpoint: {catalog.json, fingerprints.npz}
        via tmp+rename, with the previous generation kept as ``*.bak`` —
        a corrupted write can always fall back one generation (PARITY.md
        D2; the reference loses everything on any mid-write crash)."""
        with self._lock:
            os.makedirs(directory, exist_ok=True)
            a = len(self.entries)
            catalog = {
                "version": CHECKPOINT_VERSION,
                "n_coefs": self.n_coefs,
                "contexts": self.contexts,
                "entries": [e.to_dict() for e in self.entries],
            }
            mat_path = os.path.join(directory, MATRIX_FILE)
            cat_path = os.path.join(directory, CATALOG_FILE)
            mat_tmp = mat_path + ".tmp"
            cat_tmp = cat_path + ".tmp"
            with open(mat_tmp, "wb") as f:
                np.savez_compressed(f, matrix=self._matrix[:a])
            with open(cat_tmp, "w") as f:
                json.dump(catalog, f, indent=1)
            # rotate the previous generation, then matrix first / catalog
            # last so a live catalog always has its matrix
            for path in (mat_path, cat_path):
                if os.path.exists(path):
                    os.replace(path, path + ".bak")
            os.replace(mat_tmp, mat_path)
            os.replace(cat_tmp, cat_path)
            log.debug("checkpointed %d audios to %s", a, directory)

    @staticmethod
    def load(
        directory: str, n_coefs: int = DEF_N_COEFS, mesh=None
    ) -> "FingerprintStore":
        """Restore from a checkpoint; empty store when none exists — the
        restore-on-load path (/root/reference/src/fp_handler.c:80-87).
        A corrupted current generation falls back to ``*.bak``."""
        store = FingerprintStore(n_coefs=n_coefs, mesh=mesh)
        for suffix in ("", ".bak"):
            cat_path = os.path.join(directory, CATALOG_FILE + suffix)
            mat_path = os.path.join(directory, MATRIX_FILE + suffix)
            if not (os.path.exists(cat_path) and os.path.exists(mat_path)):
                continue
            try:
                return FingerprintStore._load_files(
                    cat_path, mat_path, n_coefs, mesh
                )
            except CheckpointIncompatible:
                raise  # incompatible checkpoint: fail loudly, don't mask
            except Exception:  # noqa: BLE001 - corrupt generation
                log.warning(
                    "checkpoint generation %r unreadable, trying previous",
                    suffix or "current",
                )
        return store

    @staticmethod
    def _load_files(cat_path, mat_path, n_coefs, mesh) -> "FingerprintStore":
        store = FingerprintStore(n_coefs=n_coefs, mesh=mesh)
        with open(cat_path) as f:
            catalog = json.load(f)
        if catalog.get("version") != CHECKPOINT_VERSION:
            raise CheckpointIncompatible(
                f"unsupported checkpoint version {catalog.get('version')}"
            )
        if int(catalog["n_coefs"]) != store.n_coefs:
            raise CheckpointIncompatible(
                f"checkpoint has n_coefs={catalog['n_coefs']}, store wants {n_coefs}"
            )
        with np.load(mat_path) as data:
            matrix = data["matrix"].astype(np.float32)
        store.contexts = dict(catalog["contexts"])
        store.entries = [AudioEntry.from_dict(d) for d in catalog["entries"]]
        store._hash_index = {(e.context, e.hash): e for e in store.entries}
        if matrix.shape[0] != len(store.entries):
            # catalog and matrix from different generations — e.g. a crash
            # between save()'s two renames. Corruption, not incompatibility:
            # plain ValueError so load() falls back to the .bak generation.
            raise ValueError("checkpoint catalog/matrix row count mismatch")
        if len(store.entries):
            store._ensure_capacity(len(store.entries), matrix.shape[1])
            store._matrix[: matrix.shape[0], : matrix.shape[1]] = matrix
        store._dirty = True
        log.debug("restored %d audios from %s", len(store.entries), cat_path)
        return store

    # convenience for tests / tools
    def iter_entries(self) -> Iterable[AudioEntry]:
        with self._lock:
            return list(self.entries)
