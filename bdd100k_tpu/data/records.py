"""ArrayRecord shard converter + readers (SURVEY.md §2.1 "Record converter").

The reference converts images+labels to TFRecord shards for training
throughput; the TPU-native equivalent is ArrayRecord (random-access, grain's
native format) with msgpack-encoded records:

    {"name": str, "jpeg": bytes, "boxes": [[x1,y1,x2,y2]...] float pixels,
     "labels": [int...], "width": int, "height": int}

Boxes stay in pixel corners (the BDD100K convention) and are normalized at
read time, mirroring the JSON parser, so either source yields identical
training examples.

Two readers:
  * `ArrayRecordDetectionDataset` — random-access, drop-in for
    pipeline.DetectionDataset (works with make_loader's thread pool);
  * `make_grain_loader` — a grain DataLoader over the shards with
    multi-worker decode + per-host sharding (SURVEY.md §2.8
    "Collective-aware input").
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from bdd100k_tpu.data.bdd100k import (
    IMAGE_HEIGHT,
    IMAGE_WIDTH,
    load_bdd100k_labels,
    pad_ground_truth,
)
from bdd100k_tpu.data.pipeline import Batch


def convert_bdd100k_to_arrayrecord(
    labels_path: str | Path,
    image_dir: str | Path,
    out_dir: str | Path,
    shard_size: int = 1024,
    image_height: int = IMAGE_HEIGHT,
    image_width: int = IMAGE_WIDTH,
) -> list[Path]:
    """One-shot conversion: BDD100K JSON + JPEGs → ArrayRecord shards.

    Returns the shard paths (out_dir/shard-NNNNN.array_record). Images are
    stored as their original JPEG bytes (no re-encode); GT is denormalized
    pixel corners exactly as parsed.
    """
    import msgpack
    from array_record.python.array_record_module import ArrayRecordWriter

    records = load_bdd100k_labels(labels_path)
    image_dir = Path(image_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = []
    writer = None
    for i, rec in enumerate(records):
        if i % shard_size == 0:
            if writer is not None:
                writer.close()
            p = out_dir / f"shard-{i // shard_size:05d}.array_record"
            writer = ArrayRecordWriter(str(p), "group_size:1")
            paths.append(p)
        jpeg = (image_dir / rec["name"]).read_bytes()
        # parser emits normalized corners; store pixels (BDD100K convention)
        boxes_px = (
            np.asarray(rec["boxes"], np.float32).reshape(-1, 4)
            * np.array(
                [image_width, image_height, image_width, image_height],
                np.float32,
            )
        )
        writer.write(
            msgpack.packb(
                {
                    "name": rec["name"],
                    "jpeg": jpeg,
                    "boxes": boxes_px.tolist(),
                    "labels": [int(x) for x in rec["labels"]],
                    "width": image_width,
                    "height": image_height,
                }
            )
        )
    if writer is not None:
        writer.close()
    return paths


def _decode_record(raw: bytes, max_boxes: int, image_height: int,
                   image_width: int) -> dict:
    import io

    import msgpack
    from PIL import Image

    rec = msgpack.unpackb(raw)
    with Image.open(io.BytesIO(rec["jpeg"])) as im:
        im = im.convert("RGB")
        if im.size != (image_width, image_height):
            im = im.resize((image_width, image_height))
        image = np.asarray(im, dtype=np.uint8)
    boxes_px = np.asarray(rec["boxes"], np.float32).reshape(-1, 4)
    norm = np.array(
        [rec["width"], rec["height"], rec["width"], rec["height"]],
        np.float32,
    )
    boxes, labels, mask = pad_ground_truth(
        boxes_px / norm, np.asarray(rec["labels"], np.int32), max_boxes
    )
    return {
        "image": image,
        "boxes": boxes,
        "labels": labels,
        "mask": mask,
        "name": rec["name"],
    }


class ArrayRecordDetectionDataset:
    """Random-access reader over ArrayRecord shards; drop-in for
    pipeline.DetectionDataset (same __len__/__getitem__ contract, so
    make_loader / prefetch_to_device work unchanged)."""

    def __init__(
        self,
        shards: Sequence[str | Path] | str | Path,
        max_boxes: int = 100,
        image_height: int = IMAGE_HEIGHT,
        image_width: int = IMAGE_WIDTH,
    ):
        from array_record.python.array_record_data_source import (
            ArrayRecordDataSource,
        )

        if isinstance(shards, (str, Path)):
            shards = sorted(Path(shards).glob("*.array_record"))
        if not shards:
            raise ValueError("no ArrayRecord shards found")
        self._source = ArrayRecordDataSource([str(s) for s in shards])
        self.max_boxes = max_boxes
        self.image_height = image_height
        self.image_width = image_width

    def __len__(self) -> int:
        return len(self._source)

    def __getitem__(self, i: int) -> dict:
        return _decode_record(
            self._source[int(i)], self.max_boxes, self.image_height,
            self.image_width,
        )


def convert_bdd100k_to_tfrecord(
    labels_path: str | Path,
    image_dir: str | Path,
    out_dir: str | Path,
    shard_size: int = 1024,
    image_height: int = IMAGE_HEIGHT,
    image_width: int = IMAGE_WIDTH,
) -> list[Path]:
    """Drop-in parity with the reference's TFRecord converter (SURVEY.md
    §2.1): images+labels → sharded TFRecords of tf.train.Example with the
    standard detection keys (image/encoded, image/object/bbox/{xmin,...},
    image/object/class/label). ArrayRecord (above) is the TPU-native
    plan-of-record; this exists so TFRecord corpora interoperate."""
    import tensorflow as tf

    records = load_bdd100k_labels(labels_path)
    image_dir = Path(image_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def _bytes(v):
        return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))

    def _floats(v):
        return tf.train.Feature(float_list=tf.train.FloatList(value=list(v)))

    def _ints(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(value=list(v)))

    paths, writer = [], None
    for i, rec in enumerate(records):
        if i % shard_size == 0:
            if writer is not None:
                writer.close()
            p = out_dir / f"shard-{i // shard_size:05d}.tfrecord"
            writer = tf.io.TFRecordWriter(str(p))
            paths.append(p)
        boxes = np.asarray(rec["boxes"], np.float32).reshape(-1, 4)
        example = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "image/encoded": _bytes(
                        (image_dir / rec["name"]).read_bytes()
                    ),
                    "image/filename": _bytes(rec["name"].encode()),
                    "image/height": _ints([image_height]),
                    "image/width": _ints([image_width]),
                    "image/object/bbox/xmin": _floats(boxes[:, 0]),
                    "image/object/bbox/ymin": _floats(boxes[:, 1]),
                    "image/object/bbox/xmax": _floats(boxes[:, 2]),
                    "image/object/bbox/ymax": _floats(boxes[:, 3]),
                    "image/object/class/label": _ints(rec["labels"]),
                }
            )
        )
        writer.write(example.SerializeToString())
    if writer is not None:
        writer.close()
    return paths


class TFRecordDetectionDataset:
    """Random-access reader over the TFRecord shards written above; same
    __len__/__getitem__ contract as DetectionDataset (index built once)."""

    def __init__(
        self,
        shards: Sequence[str | Path] | str | Path,
        max_boxes: int = 100,
        image_height: int = IMAGE_HEIGHT,
        image_width: int = IMAGE_WIDTH,
    ):
        import tensorflow as tf

        if isinstance(shards, (str, Path)):
            shards = sorted(Path(shards).glob("*.tfrecord"))
        if not shards:
            raise ValueError("no TFRecord shards found")
        self._raw = list(
            tf.data.TFRecordDataset([str(s) for s in shards])
            .as_numpy_iterator()
        )
        self.max_boxes = max_boxes
        self.image_height = image_height
        self.image_width = image_width

    def __len__(self) -> int:
        return len(self._raw)

    def __getitem__(self, i: int) -> dict:
        import io

        import tensorflow as tf
        from PIL import Image

        ex = tf.train.Example()
        ex.ParseFromString(self._raw[int(i)])
        f = ex.features.feature
        with Image.open(
            io.BytesIO(f["image/encoded"].bytes_list.value[0])
        ) as im:
            im = im.convert("RGB")
            if im.size != (self.image_width, self.image_height):
                im = im.resize((self.image_width, self.image_height))
            image = np.asarray(im, dtype=np.uint8)
        boxes = np.stack(
            [
                np.asarray(f[f"image/object/bbox/{k}"].float_list.value,
                           np.float32)
                for k in ("xmin", "ymin", "xmax", "ymax")
            ],
            axis=-1,
        ) if f["image/object/bbox/xmin"].float_list.value else np.zeros(
            (0, 4), np.float32
        )
        labels = np.asarray(
            f["image/object/class/label"].int64_list.value, np.int32
        )
        pb, pl, pm = pad_ground_truth(boxes, labels, self.max_boxes)
        return {
            "image": image,
            "boxes": pb,
            "labels": pl,
            "mask": pm,
            "name": f["image/filename"].bytes_list.value[0].decode(),
        }


class GrainBatchLoader:
    """Iterator of pipeline.Batch over a grain DataLoader, exposing grain's
    NATIVE iterator checkpointing (SURVEY.md §5.4 "grain iterator state").

    `state_after(n)` returns the serialized iterator state as it stood
    after exactly `n` batches had been consumed — exact even when a
    prefetcher has already pulled several batches ahead of the train step
    (states are recorded per __next__ and looked up by count, so the saved
    checkpoint resumes at the step's true position, not the prefetch
    frontier). `set_state` restores a previously saved state; the next
    batch continues the exact shuffle position, mid-epoch.
    """

    # prefetch queues hold ~4 batches; keep a margin of recorded states
    _KEEP_STATES = 64

    def __init__(self, loader):
        from collections import OrderedDict

        self._it = loader.__iter__()
        self._count = 0
        self._states: "OrderedDict[int, bytes]" = OrderedDict()
        self._states[0] = self._it.get_state()

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        b = next(self._it)
        self._count += 1
        self._states[self._count] = self._it.get_state()
        while len(self._states) > self._KEEP_STATES:
            self._states.popitem(last=False)
        return Batch(
            images=np.asarray(b["image"]),
            boxes=np.asarray(b["boxes"]),
            labels=np.asarray(b["labels"]),
            mask=np.asarray(b["mask"]),
        )

    def state_after(self, n_batches: int) -> bytes:
        """Iterator state after exactly `n_batches` consumed batches."""
        return self._states[n_batches]

    def get_state(self) -> bytes:
        return self._it.get_state()

    def set_state(self, state: bytes) -> None:
        from collections import OrderedDict

        self._it.set_state(state)
        self._count = 0
        self._states = OrderedDict({0: state})


def make_grain_loader(
    dataset: ArrayRecordDetectionDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 0,
    num_epochs: int | None = None,
    drop_last: bool = True,
    process_index: int = 0,
    process_count: int = 1,
) -> GrainBatchLoader:
    """grain DataLoader over the dataset: multi-worker decode, per-host
    sharding, deterministic shuffling — the SURVEY.md §2.1 'grain
    IndexSampler+DataLoader' input stage. Returns a GrainBatchLoader
    (iterator of pipeline.Batch with get_state/set_state checkpointing)."""
    import grain.python as grain

    class _Decode(grain.MapTransform):
        def __init__(self, ds):
            self._ds = ds

        def map(self, i: int) -> dict:
            return self._ds[i]

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.ShardOptions(
            shard_index=process_index,
            shard_count=process_count,
            drop_remainder=True,
        ),
    )
    loader = grain.DataLoader(
        data_source=np.arange(len(dataset)),
        sampler=sampler,
        operations=[
            _Decode(dataset),
            grain.Batch(batch_size=batch_size, drop_remainder=drop_last),
        ],
        worker_count=num_workers,
    )
    return GrainBatchLoader(loader)
