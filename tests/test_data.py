"""Data-layer tests: shard semantics (DALI parity), loaders, synthetic reader."""

import os

import numpy as np
import pytest

from multimodal_active_ai_tpu.data import (
    HostLoader,
    SyntheticReader,
    compute_shard_size,
    list_coco_images,
    list_image_folder,
    shard_files,
)


def test_compute_shard_size_pad_last_batch():
    # epoch 1000, 3 shards, padded to 1002 -> shards 334/334/334
    sizes = [compute_shard_size(1000, i, 3, 32) for i in range(3)]
    assert sum(sizes) >= 1000
    assert max(sizes) - min(sizes) <= 1


def test_compute_shard_size_single_shard():
    assert compute_shard_size(777, 0, 1, 32) == 777


def test_shard_files_cover_and_pad():
    files = list(range(10))
    shards = [shard_files(files, i, 4) for i in range(4)]
    total = sum(len(s) for s in shards)
    assert total == 12  # padded to ceil(10/4)*4
    assert set(x for s in shards for x in s) == set(files)


def _make_image_tree(tmp_path, classes=2, per_class=3, size=32):
    from PIL import Image

    rng = np.random.RandomState(0)
    for c in range(classes):
        d = tmp_path / f"class_{c}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(tmp_path)


def test_list_image_folder(tmp_path):
    root = _make_image_tree(tmp_path)
    files, labels, classes = list_image_folder(root)
    assert len(files) == 6 and classes == ["class_0", "class_1"]
    assert labels == [0, 0, 0, 1, 1, 1]


def test_host_loader_shapes_and_padding(tmp_path):
    root = _make_image_tree(tmp_path, classes=2, per_class=3)
    files, labels, _ = list_image_folder(root)
    loader = HostLoader(files, labels, batch_size=4, canvas_size=48,
                        use_native=False)
    batches = list(iter(loader))
    assert len(batches) == 2  # 6 images, batch 4, pad_last_batch
    for images, labs in batches:
        assert images.shape == (4, 48, 48, 3) and images.dtype == np.uint8
        assert labs.shape == (4,)


def test_host_loader_sharding(tmp_path):
    root = _make_image_tree(tmp_path, classes=2, per_class=4)
    files, labels, _ = list_image_folder(root)
    l0 = HostLoader(files, labels, batch_size=2, canvas_size=32, shard_id=0,
                    num_shards=2, use_native=False)
    l1 = HostLoader(files, labels, batch_size=2, canvas_size=32, shard_id=1,
                    num_shards=2, use_native=False)
    assert l0.shard_size + l1.shard_size >= len(files)


def test_host_loader_shuffle_changes_order(tmp_path):
    root = _make_image_tree(tmp_path, classes=2, per_class=8)
    files, labels, _ = list_image_folder(root)
    loader = HostLoader(files, labels, batch_size=16, canvas_size=16,
                        shuffle=True, use_native=False)
    _, labs1 = next(iter(loader))
    loader.reset()
    _, labs2 = next(iter(loader))
    assert not np.array_equal(labs1, labs2)


def test_list_coco_images_from_dir(tmp_path):
    root = _make_image_tree(tmp_path / "imgs", classes=1, per_class=2)
    files = list_coco_images(os.path.join(root, "class_0"))
    assert len(files) == 2


def test_list_coco_images_from_annotations(tmp_path):
    import json

    d = tmp_path / "imgs"
    _make_image_tree(d, classes=1, per_class=2)
    ann = {"images": [{"file_name": "class_0/img_0.jpg"},
                      {"file_name": "class_0/img_1.jpg"}]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    files = list_coco_images(str(d), str(ann_file))
    assert len(files) == 2 and files[0].endswith("img_0.jpg")


def test_synthetic_reader():
    reader = SyntheticReader(batch_size=4, canvas_size=32, num_examples=10)
    batches = list(iter(reader))
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (4, 32, 32, 3)
    assert labels.shape == (4,)
    # deterministic across epochs
    images2, _ = next(iter(reader))
    np.testing.assert_array_equal(np.asarray(images), np.asarray(images2))


def test_build_reader_synthetic_respects_num_classes():
    """Synthetic labels must live in the configured classifier's range:
    defaulting to 1000-way labels under a --num-classes 4 criterion fed
    out-of-range targets to the cross-entropy -> NaN loss (regression)."""
    from contrastive_learning import build_reader
    from multimodal_active_ai_tpu.config import DETRConfig

    cfg = DETRConfig(dataset="synthetic", canvas_size=16, num_classes=4,
                     num_examples=8)
    reader = build_reader(cfg, "train", 0, 1, batch_size=4)
    labels = np.concatenate([np.asarray(l) for _, l in iter(reader)])
    assert labels.max() < 4 and labels.min() >= 0


def test_synthetic_reader_reset_replays_epoch():
    r = SyntheticReader(batch_size=2, canvas_size=16, num_examples=4, seed=3)
    first = [np.asarray(img) for img, _ in iter(r)]
    r.reset()
    second = [np.asarray(img) for img, _ in iter(r)]
    assert len(first) == 2
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_native_decoder_matches_pil(tmp_path):
    """C++ runtime decode (libjpeg + DCT prescale + bilinear) stays close to
    PIL's decode+bilinear on a smooth image; skipped when g++/libjpeg are
    unavailable to build the library."""
    from PIL import Image
    from multimodal_active_ai_tpu.data import native

    if not native.available():
        import pytest
        pytest.skip("native runtime not built (no g++/libjpeg)")
    ramp = np.linspace(0, 255, 200 * 300 * 3).reshape(200, 300, 3)
    arr = ramp.astype(np.uint8)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out = native.decode_resize(p, 64)
    assert out is not None and out.shape == (64, 64, 3)
    pil = np.asarray(Image.open(p).convert("RGB").resize((64, 64),
                                                         Image.BILINEAR))
    assert np.abs(out.astype(int) - pil.astype(int)).mean() < 8.0

    batch = np.empty((3, 64, 64, 3), np.uint8)
    ok = native.decode_batch([p, p, str(tmp_path / "missing.jpg")], 64, batch,
                             num_threads=2)
    assert list(ok) == [True, True, False]
    np.testing.assert_array_equal(batch[0], batch[1])


def test_coco_catalog_with_boxes(tmp_path):
    """COCOReader triple parity: files in annotation order, per-image boxes
    normalized ltrb (reference reader ratio=True, ltrb=True,
    ``NVIDIA_DALI_Pipelines.py:39-40``) + category ids."""
    import json
    from multimodal_active_ai_tpu.data.readers import bb_hflip, list_coco_images

    ann = {
        "images": [
            {"id": 7, "file_name": "b.jpg", "width": 200, "height": 100},
            {"id": 3, "file_name": "a.jpg", "width": 400, "height": 400},
        ],
        "annotations": [
            {"image_id": 7, "bbox": [20, 10, 100, 50], "category_id": 5},
            {"image_id": 7, "bbox": [0, 0, 200, 100], "category_id": 2},
            {"image_id": 3, "bbox": [100, 200, 200, 100], "category_id": 9},
        ],
    }
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))

    files, boxes, labels = list_coco_images(str(tmp_path), str(ann_file),
                                            with_boxes=True)
    assert [f.endswith(n) for f, n in zip(files, ("b.jpg", "a.jpg"))]
    np.testing.assert_allclose(
        boxes[0], [[0.1, 0.1, 0.6, 0.6], [0.0, 0.0, 1.0, 1.0]], atol=1e-6)
    np.testing.assert_allclose(boxes[1], [[0.25, 0.5, 0.75, 0.75]], atol=1e-6)
    assert list(labels[0]) == [5, 2] and list(labels[1]) == [9]

    # bbox-consistent horizontal flip (ops.BbFlip ltrb semantics)
    flipped = bb_hflip(boxes[0])
    np.testing.assert_allclose(
        flipped, [[0.4, 0.1, 0.9, 0.6], [0.0, 0.0, 1.0, 1.0]], atol=1e-6)
    np.testing.assert_allclose(bb_hflip(flipped), boxes[0], atol=1e-6)

    # without boxes: the plain file list (pretraining path) is unchanged
    assert list_coco_images(str(tmp_path), str(ann_file)) == files


def test_bbox_overlay_draws_rectangles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "retina_visualization",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "retina_visualization.py"))
    viz = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viz)

    img = np.zeros((100, 100, 3), np.uint8)
    out = viz.draw_boxes(img, np.array([[0.2, 0.3, 0.6, 0.8]]), thickness=2)
    assert (out[30:32, 20:61] == (255, 32, 32)).all()   # top edge
    assert (out[30:81, 20:22] == (255, 32, 32)).all()   # left edge
    assert (out[50, 40] == 0).all()                     # interior untouched


def test_loader_propagates_producer_failure(tmp_path):
    """A corrupt/unreadable file must surface as an error, not a hang: the
    producer forwards its exception through the queue as the sentinel."""
    import pytest
    from multimodal_active_ai_tpu.data.loader import HostLoader

    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"\xff\xd8 not a real jpeg")
    loader = HostLoader([str(bad)] * 4, batch_size=2, canvas_size=32,
                        num_threads=2)
    with pytest.raises(RuntimeError, match="producer failed"):
        for _ in iter(loader):
            pass


def test_canvas_cache_decode_once(tmp_path):
    """Epoch 1 decodes and fills the cache; epoch 2 streams identical
    batches from the cache with ZERO decodes; the cache file survives a
    fresh loader (restart) and a changed file list invalidates it."""
    root = _make_image_tree(tmp_path / "data", classes=2, per_class=3)
    files, labels, _ = list_image_folder(root)
    cache = str(tmp_path / "cache")
    loader = HostLoader(files, labels, batch_size=3, canvas_size=32,
                        use_native=False, cache_dir=cache)
    ep1 = [img.copy() for img, _ in iter(loader)]
    assert loader.stats["decoded"] == 6 and loader.stats["cache_hits"] == 0
    assert loader.cache.complete
    loader.reset()
    ep2 = [img.copy() for img, _ in iter(loader)]
    assert loader.stats["decoded"] == 0 and loader.stats["cache_hits"] == 6
    for a, b in zip(ep1, ep2):
        np.testing.assert_array_equal(a, b)
    assert "0 decoded, 6 cache hits" in loader.stats_line()

    # restart: a fresh loader reuses the on-disk cache
    loader2 = HostLoader(files, labels, batch_size=3, canvas_size=32,
                         use_native=False, cache_dir=cache)
    assert loader2.cache.complete
    ep3 = [img.copy() for img, _ in iter(loader2)]
    assert loader2.stats["decoded"] == 0
    for a, b in zip(ep1, ep3):
        np.testing.assert_array_equal(a, b)

    # different file list -> different fingerprint -> fresh (empty) cache
    loader3 = HostLoader(files[:5], labels[:5], batch_size=5, canvas_size=32,
                         use_native=False, cache_dir=cache)
    assert not loader3.cache.complete and loader3.cache.hits == 0


def test_canvas_cache_with_shuffle_covers_all(tmp_path):
    """A shuffled first epoch still decodes every file exactly once into
    the cache (the epoch order is a permutation plus pad repeats)."""
    root = _make_image_tree(tmp_path / "data", classes=2, per_class=3)
    files, labels, _ = list_image_folder(root)
    loader = HostLoader(files, labels, batch_size=2, canvas_size=32,
                        shuffle=True, use_native=False,
                        cache_dir=str(tmp_path / "cache"))
    list(iter(loader))
    assert loader.cache.complete


def test_canvas_cache_partial_state_rebuilds(tmp_path):
    """Mismatched on-disk halves must rebuild, not crash or serve garbage:
    (a) missing .flags with data present; (b) the big .u8 deleted to
    reclaim space while stale all-ones .flags remain."""
    root = _make_image_tree(tmp_path / "data", classes=2, per_class=2)
    files, labels, _ = list_image_folder(root)
    cache = str(tmp_path / "cache")
    loader = HostLoader(files, labels, batch_size=2, canvas_size=32,
                        use_native=False, cache_dir=cache)
    ep1 = [img.copy() for img, _ in iter(loader)]
    assert loader.cache.complete

    # (a) flags file vanishes -> fresh loader rebuilds instead of crashing
    os.remove(loader.cache.flag_path)
    l2 = HostLoader(files, labels, batch_size=2, canvas_size=32,
                    use_native=False, cache_dir=cache)
    assert not l2.cache.complete
    ep2 = [img.copy() for img, _ in iter(l2)]
    assert l2.stats["decoded"] == 4 and l2.cache.complete
    for a, b in zip(ep1, ep2):
        np.testing.assert_array_equal(a, b)

    # (b) data file vanishes, stale flags remain -> must NOT serve zeros
    os.remove(l2.cache.data_path)
    l3 = HostLoader(files, labels, batch_size=2, canvas_size=32,
                    use_native=False, cache_dir=cache)
    assert not l3.cache.complete and l3.cache.hits == 0
    ep3 = [img.copy() for img, _ in iter(l3)]
    assert l3.stats["decoded"] == 4
    for a, b in zip(ep1, ep3):
        np.testing.assert_array_equal(a, b)


def test_canvas_cache_invalidation_guards(tmp_path, monkeypatch):
    """Round-4 advisor items: (a) in-place content changes (same paths, new
    size/mtime) invalidate the cache; (b) a different decode backend does;
    (c) a corrupt/truncated meta file rebuilds instead of raising; (d) the
    projected-size guard refuses oversized caches without an override."""
    from multimodal_active_ai_tpu.data.loader import CanvasCache

    files = []
    for i in range(3):
        p = tmp_path / f"f{i}.jpg"
        p.write_bytes(b"x" * (10 + i))
        files.append(str(p))
    cache = str(tmp_path / "cache")
    c1 = CanvasCache(cache, files, 8)
    c1.put(0, np.zeros((8, 8, 3), np.uint8))
    assert CanvasCache(cache, files, 8).hits == 1    # unchanged -> reuse

    os.utime(files[0], (1, 1))                       # (a) regenerated file
    c2 = CanvasCache(cache, files, 8)
    assert c2.fingerprint != c1.fingerprint and c2.hits == 0

    c3 = CanvasCache(cache, files, 8, decoder_id="native")   # (b)
    assert c3.fingerprint != c2.fingerprint

    with open(c2.meta_path, "w") as f:               # (c) truncated meta
        f.write('{"n": 3, "can')
    assert CanvasCache(cache, files, 8).hits == 0

    monkeypatch.setenv("MAAI_CANVAS_CACHE_MAX_GB", "0.000001")   # (d)
    with pytest.raises(RuntimeError, match="canvas cache"):
        CanvasCache(cache, files, 64)


def test_canvas_cache_read_rows_with_readahead_hint(tmp_path):
    """read_rows' MADV_WILLNEED readahead hint (issued per contiguous row
    run, non-monotonic and duplicate row orders included) must not perturb
    the gathered bytes."""
    from multimodal_active_ai_tpu.data.loader import CanvasCache

    files = []
    for i in range(7):
        p = tmp_path / f"f{i}.jpg"
        p.write_bytes(b"x")
        files.append(str(p))
    c = CanvasCache(str(tmp_path / "cache"), files, 8)
    imgs = np.arange(7 * 8 * 8 * 3, dtype=np.uint8).reshape(7, 8, 8, 3)
    for i in range(7):
        c.put(i, imgs[i])
    rows = np.array([5, 0, 1, 2, 5, 6], np.int64)   # runs: [0,2], [5,6]
    out = np.zeros((6, 8, 8, 3), np.uint8)
    c.read_rows(rows, out, np.arange(6))
    np.testing.assert_array_equal(out, imgs[rows])

    # empty gather is a no-op (the readahead run-collapse must not index
    # into an empty row array)
    c.read_rows(np.array([], np.int64), out, np.array([], np.int64))
    np.testing.assert_array_equal(out, imgs[rows])


def test_loader_decoder_identity_splits_cache(tmp_path):
    """PIL- and native-decoded canvases differ pixelwise: a loader with the
    other backend must not serve the first backend's cache rows."""
    from multimodal_active_ai_tpu.data import native
    from multimodal_active_ai_tpu.data.loader import HostLoader

    root = _make_image_tree(tmp_path / "data", classes=1, per_class=2)
    files, labels, _ = list_image_folder(root)
    cache = str(tmp_path / "cache")
    pil = HostLoader(files, labels, batch_size=2, canvas_size=32,
                     use_native=False, cache_dir=cache)
    list(iter(pil))
    assert pil.cache.complete
    if not native.available():
        pytest.skip("native decoder not built")
    nat = HostLoader(files, labels, batch_size=2, canvas_size=32,
                     use_native=True, cache_dir=cache)
    assert nat.cache.fingerprint != pil.cache.fingerprint
    assert nat.cache.hits == 0


def test_device_prefetch_overlap_order_and_errors():
    """Round-3 verdict #7: the H2D transfer of batch N+1 must overlap the
    step on batch N. With put=0.2 s and step=0.2 s over 5 batches, the
    serial path costs ~2.0 s; the prefetched path hides the puts behind the
    steps (~1.2 s). Also: order preserved, source errors surface, depth=0
    degrades to synchronous."""
    from time import perf_counter, sleep

    from multimodal_active_ai_tpu.data.prefetch import device_prefetch

    def put(b):
        sleep(0.2)
        return b * 10

    t0 = perf_counter()
    got = []
    for item in device_prefetch(iter(range(5)), put, depth=2):
        sleep(0.2)          # the "device step"
        got.append(item)
    dt = perf_counter() - t0
    assert got == [0, 10, 20, 30, 40]
    assert dt < 1.7, dt     # serial would be >= 2.0 s

    # depth=0: synchronous identity pipeline
    assert list(device_prefetch(iter([1, 2]), put, depth=0)) == [10, 20]

    def boom():
        yield 1
        raise ValueError("reader died")

    it = device_prefetch(boom(), lambda b: b, depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="device prefetch"):
        for _ in it:
            pass


def test_device_prefetch_sentinel_survives_consumer_stall(monkeypatch):
    """A consumer stalled past the put timeout with the queue full (a
    multi-minute XLA compile on batch 0 is routine) must NOT lose the
    worker's end/exception sentinel — the old single-timeout put dropped it
    and left the consumer parked on q.get() forever."""
    import threading
    from time import sleep

    from multimodal_active_ai_tpu.data import prefetch as pf

    monkeypatch.setattr(pf, "_PUT_TIMEOUT", 0.05)

    def source():
        yield "a"
        yield "b"
        raise ValueError("reader died mid-epoch")

    it = pf.device_prefetch(source(), lambda b: b, depth=1)
    assert next(it) == "a"      # starts the worker; "b" fills the queue
    sleep(0.5)                  # worker parks on the exc put, >> put timeout
    assert next(it) == "b"

    result = {}

    def consume():
        try:
            next(it)
        except BaseException as exc:  # noqa: BLE001
            result["exc"] = exc

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(5.0)
    assert not t.is_alive(), "exception sentinel dropped; consumer hung"
    assert isinstance(result["exc"], RuntimeError)
    assert isinstance(result["exc"].__cause__, ValueError)
