"""Host input pipeline: decode workers → fixed batches → HBM prefetch.

TPU-native shape of the reference's `tf.data`/feed-dict stage (SURVEY.md
§2.1): JPEG decode is host work (TPUs can't decode JPEG — SURVEY.md §2.7),
done by a thread pool that pipelines ahead of the device; everything after
`device_put` (resize/normalize/augment) is the jitted `augment_batch`
program. `prefetch_to_device` keeps a double buffer in HBM so the TPU never
waits on the host (BASELINE.json:5 "double-buffered prefetch").

Per-host sharding for multi-host DP: pass process_index/process_count so
each host decodes only its shard of the global batch (SURVEY.md §2.8).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, NamedTuple, Sequence

import jax
import numpy as np

from bdd100k_tpu.data.bdd100k import (
    IMAGE_HEIGHT,
    IMAGE_WIDTH,
    load_bdd100k_labels,
    pad_ground_truth,
)


class Batch(NamedTuple):
    images: "np.ndarray | tuple[np.ndarray, np.ndarray]"
    # (B, H, W, 3) uint8 RGB, or (y (B,S,S), uv (B,S/2,S/2,2)) uint8 planes
    # when the loader runs with wire_format="yuv420" (half the bytes over
    # the host→device link; augment.yuv420_to_rgb_batch reconstructs).
    boxes: np.ndarray    # (B, M, 4) float32 normalized corners
    labels: np.ndarray   # (B, M) int32
    mask: np.ndarray     # (B, M) bool


def rgb_to_yuv420_host(images: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, H, W, 3) uint8 RGB → (y (N,H,W), uv (N,H/2,W/2,2)) planes.

    NumPy fallback mirroring native/decode_pool.cc decode_one_yuv420
    (BT.601 full-range forward matrix + 2x2 chroma mean) for when the
    native pool isn't built; also the test oracle for it. H and W must be
    even."""
    f = images.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    n, h, w = images.shape[:3]
    uv = np.stack([cb, cr], axis=-1)
    uv = uv.reshape(n, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    return (
        np.clip(y + 0.5, 0, 255).astype(np.uint8),
        np.clip(uv + 0.5, 0, 255).astype(np.uint8),
    )


def decode_jpeg_bytes_resized(data: bytes, size: int) -> np.ndarray:
    """Decode in-memory JPEG bytes straight to (size, size, 3) uint8 RGB.

    Uses the libjpeg DCT-domain downscale (cv2 IMREAD_REDUCED / PIL draft)
    to skip full-resolution IDCT when the target is ≤ half the source —
    ~2× faster than decode-then-resize on one core (SURVEY.md §7 "Host JPEG
    decode throughput ... the likely bottleneck"). Shared by the path-based
    loader and the record readers (data/records.py), so the records path
    gets the same DCT fast path as the JSON path (VERDICT r3 weak #3).
    """
    import io

    try:
        import cv2
        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:  # header only — no decode
            w, h = im.size
        # deepest DCT reduction that still oversamples the target
        if min(w, h) >= 4 * size:
            flag = cv2.IMREAD_REDUCED_COLOR_4
        elif min(w, h) >= 2 * size:
            flag = cv2.IMREAD_REDUCED_COLOR_2
        else:
            flag = cv2.IMREAD_COLOR
        img = cv2.imdecode(np.frombuffer(data, np.uint8), flag)
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(img[..., ::-1])  # BGR → RGB
    except ImportError:
        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:
            im.draft("RGB", (size, size))
            im = im.convert("RGB").resize((size, size))
            return np.asarray(im, dtype=np.uint8)


def decode_jpeg_resized(path: str | Path, size: int) -> np.ndarray:
    """Decode a JPEG file straight to (size, size, 3) uint8 RGB (see
    :func:`decode_jpeg_bytes_resized` for the DCT-downscale rationale)."""
    return decode_jpeg_bytes_resized(Path(path).read_bytes(), size)


class DetectionDataset:
    """Random-access dataset of (jpeg path, padded GT)."""

    def __init__(
        self,
        records: Sequence[dict],
        image_dir: str | Path,
        max_boxes: int = 100,
        image_height: int = IMAGE_HEIGHT,
        image_width: int = IMAGE_WIDTH,
        decode_size: int | None = None,
    ):
        """`decode_size`: if set, decode straight to a (S, S) square on the
        host — using the JPEG DCT-domain downscale (draft / reduced-color
        decode, ~2× faster than full decode) plus a host resize. Boxes are
        normalized, so GT is unaffected. This matches the reference's
        host-side resize placement and cuts host→HBM transfer ~10× for
        inference paths that would resize on device anyway; leave None for
        training so the fused device augment crops at native resolution."""
        self.records = list(records)
        self.image_dir = Path(image_dir)
        self.max_boxes = max_boxes
        self.image_height = image_height
        self.image_width = image_width
        self.decode_size = decode_size

    @classmethod
    def from_bdd100k(
        cls,
        labels_path: str | Path,
        image_dir: str | Path,
        max_boxes: int = 100,
        **kw,
    ) -> "DetectionDataset":
        return cls(load_bdd100k_labels(labels_path), image_dir, max_boxes, **kw)

    def __len__(self) -> int:
        return len(self.records)

    def _decode(self, name: str) -> np.ndarray:
        path = self.image_dir / name
        if self.decode_size is not None:
            return decode_jpeg_resized(path, self.decode_size)
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB")
            if im.size != (self.image_width, self.image_height):
                im = im.resize((self.image_width, self.image_height))
            return np.asarray(im, dtype=np.uint8)

    def __getitem__(self, i: int) -> dict:
        rec = self.records[i]
        boxes, labels, mask = pad_ground_truth(
            rec["boxes"], rec["labels"], self.max_boxes
        )
        return {
            "image": self._decode(rec["name"]),
            "boxes": boxes,
            "labels": labels,
            "mask": mask,
            "name": rec["name"],
        }

    def padded_gt_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All ground truth pre-padded into (N, M, 4)/(N, M)/(N, M) arrays.

        Built once and cached: per-batch GT assembly then becomes one numpy
        gather instead of per-image pad_ground_truth calls — python-side
        work per batch matters on this one-core host because it competes
        with decode threads and transfer staging for the GIL/core."""
        key = (len(self.records), self.max_boxes)
        if getattr(self, "_gt_cache_key", None) != key:
            n, m = len(self.records), self.max_boxes
            boxes = np.zeros((n, m, 4), np.float32)
            labels = np.zeros((n, m), np.int32)
            mask = np.zeros((n, m), bool)
            for i, rec in enumerate(self.records):
                boxes[i], labels[i], mask[i] = pad_ground_truth(
                    rec["boxes"], rec["labels"], m
                )
            self._gt_arrays = (boxes, labels, mask)
            self._gt_cache_key = key
        return self._gt_arrays


def resolve_wire(choice: str = "auto", dataset=None) -> str:
    """Resolve a --wire flag to a concrete format.

    "auto" → "yuv420" when the native decode pool is built AND the
    dataset's decode_size satisfies the 4:2:0 evenness precondition
    (always true when no dataset is given — the caller promises even
    frames); otherwise "rgb". Single point of truth for the policy shared
    by bench.py, the benchmark matrix, and the eval/infer drivers."""
    if choice != "auto":
        return choice
    size = getattr(dataset, "decode_size", None) if dataset is not None else 0
    if dataset is not None and (size is None or size % 2):
        return "rgb"
    from bdd100k_tpu.data import native_decode as nd

    return "yuv420" if nd.available() else "rgb"


def make_loader(
    dataset: DetectionDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 8,
    drop_last: bool = True,
    num_epochs: int | None = None,
    process_index: int = 0,
    process_count: int = 1,
    native_decode: bool | None = None,
    skip_steps: int = 0,
    wire_format: str = "rgb",
) -> Iterator[Batch]:
    """Decode-ahead batch iterator.

    Images decode concurrently while the previous batch is on device;
    indices are sharded per host (process_index::count). Two decode engines:

      * native (default when the dataset has `decode_size` and the C++ pool
        built): the whole batch is ONE GIL-releasing call into
        native/decode_pool.cc — libjpeg DCT downscale + resize on real OS
        threads (SURVEY.md §2.7 "host-side decode workers").
      * Python thread pool over dataset.__getitem__ (cv2/PIL) otherwise.

    `skip_steps`: deterministically fast-forward past the first N batches
    without decoding them — the resume path (SURVEY.md §5.4 "grain iterator
    state"). The shuffle is a pure function of (seed, epoch), so a resumed
    run at step N continues the exact permutation the killed run was on,
    mid-epoch, instead of reshuffling from epoch 0. Epoch skips only
    advance the RNG; intra-epoch skips only advance the index cursor.

    `wire_format="yuv420"` (requires `decode_size`, even): batches carry
    planar (y, uv) uint8 instead of RGB — half the host→device bytes, with
    RGB reconstructed on device (augment.yuv420_to_rgb_batch).
    """
    if wire_format not in ("rgb", "yuv420"):
        raise ValueError(f"unknown wire_format {wire_format!r}")
    if wire_format == "yuv420":
        size = getattr(dataset, "decode_size", None)
        if size is None or size % 2:
            raise ValueError("wire_format='yuv420' needs an even decode_size")
    use_native = False
    decoder = None
    if getattr(dataset, "decode_size", None) is not None and native_decode is not False:
        from bdd100k_tpu.data import native_decode as nd

        if nd.available():
            decoder = nd.NativeDecoder(num_workers)
            use_native = True
        elif native_decode:
            raise RuntimeError("native_decode requested but pool unavailable")

    local = np.arange(len(dataset))[process_index::process_count]
    if process_count > 1:
        # Equal per-host cardinality: when len(dataset) % process_count != 0
        # the strided shards differ by one row, so one host could yield one
        # more batch per epoch than another — the global-array assembly
        # (host_local_array_to_global_array) would then hang waiting on the
        # missing participant. Drop the len % nproc spare rows everywhere.
        local = local[: len(dataset) // process_count]
    rng = np.random.RandomState(seed)
    epoch = 0
    skip_batches = 0
    if skip_steps > 0:
        per_epoch = (
            len(local) // batch_size
            if drop_last
            else -(-len(local) // batch_size)
        )
        if per_epoch > 0:
            full_epochs, skip_batches = divmod(skip_steps, per_epoch)
            for _ in range(full_epochs):
                if shuffle:
                    rng.permutation(local)  # advance RNG identically
                epoch += 1
    pool = ThreadPoolExecutor(max_workers=num_workers)

    if use_native:
        gt_boxes, gt_labels, gt_mask = dataset.padded_gt_arrays()

    def batch_native(idx):
        jpegs = list(
            pool.map(  # overlap file reads
                lambda i: (dataset.image_dir / dataset.records[i]["name"])
                .read_bytes(),
                idx,
            )
        )
        if wire_format == "yuv420":
            images = decoder.decode_batch_yuv420(jpegs, dataset.decode_size)
        else:
            images = decoder.decode_batch(jpegs, dataset.decode_size)
        return Batch(  # GT: one gather from the pre-padded arrays
            images=images,
            boxes=gt_boxes[idx],
            labels=gt_labels[idx],
            mask=gt_mask[idx],
        )

    def batch_python(idx):
        samples = list(pool.map(dataset.__getitem__, idx))
        images = np.stack([s["image"] for s in samples])
        if wire_format == "yuv420":
            images = rgb_to_yuv420_host(images)
        return Batch(
            images=images,
            boxes=np.stack([s["boxes"] for s in samples]),
            labels=np.stack([s["labels"] for s in samples]),
            mask=np.stack([s["mask"] for s in samples]),
        )

    try:
        while num_epochs is None or epoch < num_epochs:
            order = rng.permutation(local) if shuffle else local
            stop = len(order) - batch_size + 1 if drop_last else len(order)
            if stop <= 0 and not drop_last:
                stop = len(order)
            for bi, start in enumerate(range(0, max(stop, 0), batch_size)):
                if bi < skip_batches:  # mid-epoch resume cursor
                    continue
                idx = order[start : start + batch_size]
                if drop_last and len(idx) < batch_size:
                    break
                if len(idx) < batch_size:  # pad final partial batch
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1:], batch_size - len(idx))]
                    )
                yield batch_native(idx) if use_native else batch_python(idx)
            skip_batches = 0
            epoch += 1
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def prefetch_to_device(
    iterator: Iterator, size: int = 2, sharding=None,
    local_shards_mesh=None,
) -> Iterator:
    """Double-buffered host→HBM transfer running ahead of consumption.

    TWO pipeline threads so every stage overlaps: one pulls the (decoding)
    iterator into a host-side queue, the other drains it through device_put
    into a device-side queue. Host decode, host→HBM transfer, and device
    compute then run concurrently — none serializes behind another. With a
    `sharding`, batches land pre-sharded across the mesh's data axis.

    `local_shards_mesh` (multi-host DP, SURVEY.md §2.8): the iterator
    yields THIS process's local shard (global_batch / process_count rows)
    and batches are assembled into global arrays across all processes via
    `multihost_utils.host_local_array_to_global_array` — each host decodes
    and transfers only its own rows.
    """
    hq: queue.Queue = queue.Queue(maxsize=size)
    dq: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    class _Failure:
        """Carries a pipeline-thread exception to the consumer.

        Without this, a mid-run decode/IO failure would look like clean
        iterator exhaustion — training would silently truncate and eval
        would compute mAP over a partial set (ADVICE r1, medium)."""

        def __init__(self, exc: BaseException):
            self.exc = exc

    def put(batch):
        if local_shards_mesh is not None:
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as P

            return multihost_utils.host_local_array_to_global_array(
                batch, local_shards_mesh, P("data")
            )
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    def host_producer():
        try:
            for batch in iterator:
                hq.put(batch)
            hq.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            hq.put(_Failure(e))

    def device_producer():
        try:
            while True:
                item = hq.get()
                if item is _END or isinstance(item, _Failure):
                    dq.put(item)
                    return
                dq.put(put(item))
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            dq.put(_Failure(e))

    threading.Thread(target=host_producer, daemon=True).start()
    threading.Thread(target=device_producer, daemon=True).start()
    while True:
        item = dq.get()
        if item is _END:
            return
        if isinstance(item, _Failure):
            raise RuntimeError(
                "input pipeline thread failed; see cause"
            ) from item.exc
        yield item
