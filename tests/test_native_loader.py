"""Native C++ loader vs tf.data reader parity on generated VOC records."""

import os
import numpy as np
import pytest

from test_voc_io import make_fake_voc

pytest.importorskip("tensorflow")

from x_detector_tpu.data import tfrecord as tfr
from x_detector_tpu.data.native_loader import NativeLoader, native_available

if not native_available(build_if_missing=True):
    pytest.skip("native loader unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("voc")
    ids, meta = make_fake_voc(str(tmp), n_images=6)
    paths = tfr.convert_voc_to_tfrecords(
        str(tmp), [("2007", "trainval")], str(tmp / "rec"), shard_size=3)
    return ids, meta, paths


def test_native_reads_all_records(records):
    ids, meta, paths = records
    loader = NativeLoader(paths, canvas_size=64, max_gt=10, batch_size=4,
                          shuffle=False, repeat=False, num_threads=1)
    seen = []
    for batch in loader:
        assert batch["image"].shape[1:] == (64, 64, 3)
        assert batch["gt_boxes"].shape[1:] == (10, 4)
        seen.extend(i.decode() for i in batch["image_id"])
    loader.close()
    assert sorted(seen) == sorted(ids)


def test_native_matches_tfdata(records):
    ids, meta, paths = records
    # tf.data reference (unshuffled)
    ds = tfr.make_dataset(paths, canvas_size=64, max_gt=10, batch_size=1,
                          shuffle=False, repeat=False)
    ref = {b["image_id"][0].decode(): b
           for b in tfr.as_numpy_iterator(ds)}

    loader = NativeLoader(paths, canvas_size=64, max_gt=10, batch_size=1,
                          shuffle=False, repeat=False, num_threads=1)
    count = 0
    for batch in loader:
        image_id = batch["image_id"][0].decode()
        r = ref[image_id]
        np.testing.assert_allclose(batch["gt_boxes"][0], r["gt_boxes"][0],
                                   atol=1e-5)
        assert (batch["gt_labels"][0] == r["gt_labels"][0]).all()
        assert (batch["gt_mask"][0] == r["gt_mask"][0]).all()
        assert (batch["difficult"][0] == r["difficult"][0]).all()
        # decoders/resizers differ slightly (libjpeg vs TF, bilinear conv):
        # require close agreement in image content
        diff = np.abs(batch["image"][0] - r["image"][0]).mean()
        assert diff < 6.0, f"mean abs pixel diff {diff} too large"
        count += 1
    loader.close()
    assert count == len(ids)


def test_native_shuffle_and_repeat(records):
    ids, meta, paths = records
    loader = NativeLoader(paths, canvas_size=32, max_gt=10, batch_size=4,
                          shuffle=True, seed=1, repeat=True, num_threads=2)
    # Position-addressable stream: each epoch is an exact permutation, so
    # any window >= one epoch covers every id.
    batches = [next(loader) for _ in range(20)]  # 80 examples
    loader.close()
    seen = set()
    for b in batches:
        seen.update(i.decode() for i in b["image_id"])
    assert seen == set(ids)


def test_native_handles_corrupt_shard(records, tmp_path):
    ids, meta, paths = records
    bad = tmp_path / "bad.tfrecord"
    bad.write_bytes(b"this is not a tfrecord at all" * 10)
    loader = NativeLoader([str(bad)] + list(paths), canvas_size=32,
                          max_gt=10, batch_size=2, shuffle=False,
                          repeat=False, num_threads=1)
    total = sum(b["image"].shape[0] for b in loader)
    loader.close()
    assert total == len(ids)  # corrupt shard skipped, good ones read


def _stream(loader, n_batches):
    out = []
    for _ in range(n_batches):
        out.append(next(loader))
    return out


def test_native_stream_deterministic_across_thread_counts(records):
    """The batch stream is bitwise deterministic — independent of worker
    count and thread timing (position-addressable design)."""
    ids, meta, paths = records
    kw = dict(canvas_size=32, max_gt=10, batch_size=4, shuffle=True,
              seed=7, repeat=True)
    a = NativeLoader(paths, num_threads=1, **kw)
    b = NativeLoader(paths, num_threads=4, **kw)
    for ba, bb in zip(_stream(a, 10), _stream(b, 10)):
        assert ba["image_id"] == bb["image_id"]
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["gt_boxes"], bb["gt_boxes"])
    a.close(); b.close()


def test_native_epoch_is_exact_permutation(records):
    ids, meta, paths = records
    loader = NativeLoader(paths, canvas_size=32, max_gt=10, batch_size=3,
                          shuffle=True, seed=3, repeat=True, num_threads=2)
    n = loader.num_examples
    assert n == len(ids)
    epoch1, epoch2 = [], []
    for _ in range(n // 3):
        epoch1.extend(i.decode() for i in next(loader)["image_id"])
    for _ in range(n // 3):
        epoch2.extend(i.decode() for i in next(loader)["image_id"])
    loader.close()
    assert sorted(epoch1) == sorted(ids)      # exact global shuffle
    assert sorted(epoch2) == sorted(ids)
    assert epoch1 != epoch2                   # different perm per epoch


def test_native_kill_and_resume_reproduces_exact_stream(records):
    """Consume k batches, capture position, 'kill', resume from the token:
    the continuation equals the uninterrupted stream (VERDICT r1 item 5)."""
    ids, meta, paths = records
    kw = dict(canvas_size=32, max_gt=10, batch_size=4, shuffle=True,
              seed=11, repeat=True, num_threads=3)
    full = NativeLoader(paths, **kw)
    _ = _stream(full, 5)
    expected = _stream(full, 6)

    probe = NativeLoader(paths, **kw)
    _ = _stream(probe, 5)
    token = probe.position
    probe.close()  # "kill"
    assert token == 5 * 4

    resumed = NativeLoader(paths, start_example=token, **kw)
    got = _stream(resumed, 6)
    for e, g in zip(expected, got):
        assert e["image_id"] == g["image_id"]
        np.testing.assert_array_equal(e["image"], g["image"])
        np.testing.assert_array_equal(e["gt_boxes"], g["gt_boxes"])
        np.testing.assert_array_equal(e["gt_labels"], g["gt_labels"])
    full.close(); resumed.close()


def test_native_resume_nonrepeat_partial_tail(records):
    ids, meta, paths = records
    loader = NativeLoader(paths, canvas_size=32, max_gt=10, batch_size=4,
                          shuffle=False, repeat=False, num_threads=2,
                          start_example=4)
    seen = sum(b["image"].shape[0] for b in loader)
    loader.close()
    assert seen == len(ids) - 4


@pytest.mark.slow  # forces a full rebuild of the C++ loader
def test_stale_abi_so_recovers_in_process(tmp_path):
    """A fresh-mtime .so from an older ABI revision must be rebuilt AND
    reloaded within the same process.  dlopen dedups by pathname and
    ctypes never dlcloses, so re-CDLLing _SO_PATH after the rebuild
    returns the stale image — the loader must load the rebuilt library
    from a unique path (round-4 review finding).  Run in a fresh
    subprocess: this test module's own import already mapped the good
    library at that pathname, which would mask the staleness."""
    import subprocess
    import sys

    from x_detector_tpu.data import native_loader as nl

    # compile a bad .so (wrong ABI) into the real location, fresh mtime
    bad_c = tmp_path / "bad.c"
    bad_c.write_text("int xdet_loader_abi_version(void){return 999;}\n")
    subprocess.run(["cc", "-shared", "-fPIC", "-o", nl._SO_PATH,
                    str(bad_c)], check=True)

    probe = (
        "import ctypes\n"
        "from x_detector_tpu.data import native_loader as nl\n"
        # the fresh process first maps the BAD library at the real path
        # (what any prior import in a long-lived process would have done)
        f"assert ctypes.CDLL({nl._SO_PATH!r}).xdet_loader_abi_version() == 999\n"
        "lib = nl._load_library(build_if_missing=True)\n"
        "print('recovered-abi', lib.xdet_loader_abi_version())\n")
    out = subprocess.run([sys.executable, "-c", probe],
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"recovered-abi {nl._ABI_VERSION}" in out.stdout
    # and the on-disk .so was rebuilt for later processes
    check = subprocess.run(
        [sys.executable, "-c",
         "import ctypes; "
         f"print(ctypes.CDLL({nl._SO_PATH!r}).xdet_loader_abi_version())"],
        capture_output=True, text=True, check=True)
    assert check.stdout.strip() == str(nl._ABI_VERSION)
