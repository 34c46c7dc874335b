"""PNG codec, phash, and fixture-generator determinism."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from goribot_spark.functions.pngcodec import decode_png, encode_png, phash64, psnr
from goribot_spark.sources.fixtures import generate_all, generate_images


def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    for shape in [(8, 8, 3), (17, 31, 3), (64, 9, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_phash_deterministic_and_locality():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert phash64(px) == phash64(px.copy())
    # Small perturbation → small hamming distance; different image → large.
    near = px.copy()
    near[0, 0] = 0
    far = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(phash64(px), phash64(near)) <= 8
    assert ham(phash64(px), phash64(far)) > 8


def test_psnr():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 10
    assert psnr(a, b) > 40


def test_images_deterministic():
    t1 = generate_images(16, seed=42)
    t2 = generate_images(16, seed=42)
    assert t1.equals(t2)
    assert not generate_images(16, seed=43).equals(t1)


def test_fixture_graph_shape(tmp_path):
    d = str(tmp_path / "g")
    generate_all(d, n_hosts=2, depth=2, n_images=16)
    pages = pq.read_table(f"{d}/pages.parquet").to_pylist()
    # site0 hot host: fanout 4 → 21 pages; site1 fanout 3 → 13.
    hosts = {}
    for p in pages:
        hosts[p["host"]] = hosts.get(p["host"], 0) + 1
    assert hosts == {"site0.test": 21, "site1.test": 13}
    # Every page decodes/parses deterministically and url_hash is consistent.
    from goribot_spark.canon import url_hash

    for p in pages[:10]:
        assert p["url_hash"] == url_hash(p["url"])
