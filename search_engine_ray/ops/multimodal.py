"""Multimodal column plumbing (task brief): image/audio/video as
opaque `binary` columns with typed metadata.

Image decode has a REAL guarded path: `decode="real"` loads Pillow
once per actor and decodes/thumbnails each payload (raises
NotImplementedError at actor construction when PIL is not importable —
as in this container); `decode="auto"` selects real-when-available,
else the deterministic fake decode (bytes -> seeded pixel/sample
array) so the Ray-side plumbing — schema, actor-pool signature, batch
sizing, output layout — is real and tested end-to-end either way.
Video frame-sampling has the same shape: `decode="real"` is a guarded
pyav kernel (raises at actor construction when `av` is not
importable), `decode="fake"` a deterministic, SQL-replayable sampler.

Scale notes: media payloads are large, so these stages use small
`batch_size` and an actor pool (decoder state initialized once per
actor in __init__); outputs carry fixed-size tensors as
FixedSizeListArray (zero-copy to numpy downstream).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(n: int, kind: str = "image", seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests/benches (payload bytes
    derived from (seed, i); sizes vary)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")}
    for i in range(n):
        size = int(rng.integers(256, 4096))
        payload = hashlib.sha256(f"{seed}/{i}".encode()).digest() * (size // 32 + 1)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload[:size])
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(32, 512)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(32, 512)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(500, 60000)) if kind != "image" else -1)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.large_binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        }
    )


class DecodeAndFeaturize:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    decode="real": loads Pillow ONCE per actor (__init__) and decodes
    each payload as an image — resize to a dim-sized thumbnail, feature
    vector = row-mean luminance. Raises NotImplementedError at actor
    construction when Pillow is not importable (this container has no
    media libraries).
    decode="fake": deterministic pseudo-decode — features are a seeded
    function of the payload bytes (sha256-expanded), so tests can
    assert exact values and the full actor/batch path runs.
    decode="auto": real when Pillow imports, else fake — the runtime
    selection path."""

    def __init__(self, feature_dim: int = 32, decode: str = "fake"):
        self.dim = feature_dim
        self._image_mod = None
        if decode == "auto":
            decode = "real" if self._try_pillow() else "fake"
        if decode == "real" and not self._try_pillow():
            raise NotImplementedError(
                "real media decode requires pillow (PIL), not importable here; "
                "use decode='fake' (or 'auto') to exercise the pipeline plumbing"
            )
        self.decode = decode

    def _try_pillow(self) -> bool:
        if self._image_mod is None:
            try:
                from PIL import Image  # pillow: public, optional

                self._image_mod = Image
            except ImportError:
                self._image_mod = False
        return bool(self._image_mod)

    def _features_real(self, payload: bytes) -> np.ndarray:
        """Pillow decode -> dim x dim grayscale thumbnail -> row means.
        Undecodable payloads yield a zero vector (corrupt-file policy:
        keep the row, null-like features — never kill the pipeline)."""
        import io

        try:
            img = self._image_mod.open(io.BytesIO(payload)).convert("L")
            img = img.resize((self.dim, self.dim))
            px = np.asarray(img, dtype=np.float64) / 255.0
            return px.mean(axis=1)
        except Exception:
            return np.zeros(self.dim, dtype=np.float64)

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decode == "real":
            return self._features_real(payload)
        # deterministic fake "decode": counter-mode md5 over the
        # payload's hex string expands into `dim` independent floats in
        # [0, 1) — two uint64 (little-endian md5 halves) per counter
        # block. Hashing the HEX (not raw bytes) keeps every block
        # SQL-replayable: DuckDB's md5_number_upper/lower(hex || '/t')
        # are exactly these values, so mm_features carries a value
        # oracle instead of a rows-only check.
        hx = payload.hex()
        raw = b"".join(
            hashlib.md5(f"{hx}/{t}".encode()).digest()
            for t in range((self.dim * 8 + 15) // 16)
        )
        ints = np.frombuffer(raw[: self.dim * 8], dtype="<u8")
        return (ints >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = np.stack([self._features(p or b"") for p in payloads])
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float64()), self.dim
                ),
                "payload_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            }
        )


def featurize_media(
    ds: Dataset, feature_dim: int = 32, decode: str = "fake",
    batch_size: int = 64, concurrency: tuple[int, int] = (1, 8),
) -> Dataset:
    """media table -> (media_id, kind, features, payload_bytes).
    Small batch_size: payload x batch x concurrency must fit the
    worker heap (large binary payloads)."""
    return ds.map_batches(
        DecodeAndFeaturize,
        fn_constructor_kwargs={"feature_dim": feature_dim, "decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video frame-sampling actor: emits one row per sampled frame.

    decode="real": loads pyav ONCE per actor (__init__), opens the
    payload as a container, and keeps every fps_divisor-th decoded
    frame up to max_frames (frame_payload = raw RGB bytes of the
    frame). Raises NotImplementedError at actor construction when pyav
    is not importable (this container has no media libraries) — same
    guard shape as DecodeAndFeaturize's Pillow path.
    decode="fake": deterministic pseudo-sampler — one frame per
    fps_divisor seconds of duration_ms (capped at max_frames, floor
    1), frame bytes = sha256 of "payload_hex/frame_idx". Hashing the
    hex keeps the output SQL-replayable (DuckDB sha256(hex || '/i')),
    so mm_frames carries a value oracle.
    decode="auto": real when pyav imports, else fake.

    Output: media_id, frame_idx, frame_payload."""

    def __init__(self, fps_divisor: int = 10, max_frames: int = 8, decode: str = "fake"):
        self._av_mod = None
        if decode == "auto":
            decode = "real" if self._try_pyav() else "fake"
        if decode == "real" and not self._try_pyav():
            raise NotImplementedError(
                "real frame sampling requires pyav (av), not importable here; "
                "use decode='fake' (or 'auto') to exercise the pipeline plumbing"
            )
        self.decode = decode
        self.max_frames = max_frames
        self.fps_divisor = fps_divisor

    def _try_pyav(self) -> bool:
        if self._av_mod is None:
            try:
                import av  # pyav: public, optional

                self._av_mod = av
            except ImportError:
                self._av_mod = False
        return bool(self._av_mod)

    def _frames_real(self, payload: bytes) -> list[bytes]:
        """pyav container decode -> every fps_divisor-th frame's RGB
        bytes, up to max_frames. Undecodable payloads yield no frames
        (corrupt-file policy: drop frames, never kill the pipeline)."""
        import io

        out: list[bytes] = []
        try:
            with self._av_mod.open(io.BytesIO(payload)) as container:
                for i, frame in enumerate(container.decode(video=0)):
                    if i % self.fps_divisor:
                        continue
                    out.append(frame.to_ndarray(format="rgb24").tobytes())
                    if len(out) >= self.max_frames:
                        break
        except Exception:
            return []
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for mid, payload, dur in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(), t["duration_ms"].to_pylist()
        ):
            if self.decode == "real":
                fp = self._frames_real(payload or b"")
            else:
                n = min(self.max_frames, max(1, (dur or 0) // (1000 * self.fps_divisor) + 1))
                hx = (payload or b"").hex()
                fp = [hashlib.sha256(f"{hx}/{fi}".encode()).digest() for fi in range(n)]
            ids.extend([mid] * len(fp))
            frames.extend(range(len(fp)))
            payloads.extend(fp)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames, pa.int32()),
                "frame_payload": pa.array(payloads, pa.large_binary()),
            }
        )


def sample_frames(ds: Dataset, **kw) -> Dataset:
    batch_size = kw.pop("batch_size", 32)
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


class AudioEnergy:
    """Audio windowed-RMS-energy actor (the loudness/silence screen an
    audio curation pipeline runs before transcription): one row per
    media item with its per-window mean energy.

    decode="real": loads soundfile ONCE per actor (__init__), decodes
    the payload as PCM and computes per-window RMS. Raises
    NotImplementedError at actor construction when soundfile is not
    importable (this container has no media libraries) — the
    DecodeAndFeaturize guard shape.
    decode="fake": deterministic pseudo-energy — window w's energy is
    (md5_upper64(payload_hex + '/w') >> 11) / 2^53, the feat0 trick,
    so the whole op is SQL-replayable (md5_number_upper) and
    value-checked. Window count = clamp(duration_ms // window_ms,
    1, max_windows).
    decode="auto": real when soundfile imports, else fake."""

    def __init__(self, window_ms: int = 1000, max_windows: int = 16, decode: str = "fake"):
        self._sf_mod = None
        if decode == "auto":
            decode = "real" if self._try_soundfile() else "fake"
        if decode == "real" and not self._try_soundfile():
            raise NotImplementedError(
                "real audio decode requires soundfile, not importable here; "
                "use decode='fake' (or 'auto') to exercise the pipeline plumbing"
            )
        self.decode = decode
        self.window_ms = window_ms
        self.max_windows = max_windows

    def _try_soundfile(self) -> bool:
        if self._sf_mod is None:
            try:
                import soundfile  # public, optional

                self._sf_mod = soundfile
            except ImportError:
                self._sf_mod = False
        return bool(self._sf_mod)

    def _energies_real(self, payload: bytes, n: int) -> np.ndarray:
        import io

        try:
            data, rate = self._sf_mod.read(io.BytesIO(payload))
            if data.ndim > 1:
                data = data.mean(axis=1)
            win = max(1, int(rate * self.window_ms / 1000))
            out = np.empty(n)
            for w in range(n):
                seg = data[w * win : (w + 1) * win]
                out[w] = float(np.sqrt((seg**2).mean())) if seg.size else 0.0
            return out
        except Exception:
            return np.zeros(n)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, n_out, e_out = [], [], []
        for mid, payload, dur in zip(
            t["media_id"].to_pylist(),
            t["payload"].to_pylist(),
            t["duration_ms"].to_pylist(),
        ):
            n = max(1, min(self.max_windows, int(dur) // self.window_ms))
            if self.decode == "fake":
                hx = bytes(payload).hex()
                e = np.array([
                    (
                        int.from_bytes(
                            hashlib.md5(f"{hx}/{w}".encode()).digest()[:8], "little"
                        )
                        >> 11
                    )
                    / 9007199254740992.0
                    for w in range(n)
                ])
            else:
                e = self._energies_real(bytes(payload), n)
            ids.append(mid)
            n_out.append(n)
            e_out.append(float(e.sum()) / n)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_windows": pa.array(n_out, pa.int64()),
            "mean_energy": pa.array(e_out, pa.float64()),
        })


def audio_energy(ds: Dataset, **kw) -> Dataset:
    batch_size = kw.pop("batch_size", 32)
    return ds.map_batches(
        AudioEnergy,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
