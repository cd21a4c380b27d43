"""Data layer tests: native decoder (via PIL-made GIF), preprocess, sampling."""

import os

import numpy as np
import pytest
from PIL import Image

from grove_tpu.data.preprocess import clip_preprocess, sam_preprocess
from grove_tpu.data.sampling import (center_window_index,
                                     sliding_segment_with_mask, sparse_sample)


@pytest.fixture(scope="module")
def gif_clip(tmp_path_factory):
    """Animated GIF with per-frame solid colors (decodable by libav)."""
    path = tmp_path_factory.mktemp("vid") / "clip.gif"
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
              (0, 255, 255), (255, 0, 255), (128, 128, 128), (255, 255, 255)]
    frames = [Image.new("RGB", (64, 48), c) for c in colors]
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=200, loop=0)  # 5 fps
    return str(path), colors


def test_native_decoder_decode_at(gif_clip):
    from grove_tpu.data.video import VideoDecoder
    path, colors = gif_clip
    with VideoDecoder(path) as dec:
        assert dec.width == 64 and dec.height == 48
        frames = dec.decode_at([0.0, 0.4, 1.2])
        assert frames.shape == (3, 48, 64, 3)
        # frame at 0.0 -> color 0, 0.4 -> color 2, 1.2 -> color 6
        for got, want_idx in zip(frames, [0, 2, 6]):
            center = got[24, 32]
            want = np.array(colors[want_idx])
            assert np.abs(center.astype(int) - want).max() < 40, \
                (center, want)


def test_native_decoder_decode_fps(gif_clip):
    from grove_tpu.data.video import VideoDecoder
    path, colors = gif_clip
    with VideoDecoder(path) as dec:
        frames = dec.decode_fps(fps=5.0)
        assert frames.shape[0] == len(colors)
        frames2 = dec.decode_fps(fps=2.5)
        assert frames2.shape[0] == len(colors) // 2


def test_native_decoder_resize(gif_clip):
    from grove_tpu.data.video import VideoDecoder
    path, _ = gif_clip
    with VideoDecoder(path) as dec:
        frames = dec.decode_at([0.0], out_size=(32, 24))
        assert frames.shape == (1, 24, 32, 3)


def test_clip_preprocess_shape_and_norm(rng):
    frame = rng.integers(0, 255, size=(100, 200, 3), dtype=np.uint8)
    out = clip_preprocess(np.asarray(frame), size=56)
    assert out.shape == (56, 56, 3)
    assert out.dtype == np.float32
    assert -3 < out.mean() < 3


def test_sam_preprocess_pads_bottom_right(rng):
    frame = rng.integers(1, 255, size=(50, 100, 3), dtype=np.uint8)
    out = sam_preprocess(np.asarray(frame), size=64)
    assert out.shape == (64, 64, 3)
    # bottom area is padding (zeros); top-left contains data
    assert np.all(out[40:] == 0)
    assert np.any(out[:32, :64] != 0)


def test_sparse_sample_center_deterministic():
    idx = sparse_sample(40, 8, mode="center")
    assert idx.tolist() == [2, 7, 12, 17, 22, 27, 32, 37]


def test_sparse_sample_random_within_segments(rng):
    idx = sparse_sample(40, 8, mode="random", rng=rng)
    seg = 5
    for i, v in enumerate(idx):
        lo = i * seg
        hi = 40 if i == 7 else (i + 1) * seg
        assert lo <= v < hi


def test_sliding_windows_cover_all_frames():
    for n in (48, 50, 37, 8):
        windows, masks = sliding_segment_with_mask(n, 8)
        seen = set()
        for w, m in zip(windows, masks):
            for idx, keep in zip(w, m):
                if keep:
                    assert idx not in seen
                    seen.add(idx)
        assert seen == set(range(n))


def test_center_window_index():
    _, masks = sliding_segment_with_mask(48, 8)
    c = center_window_index(masks)
    assert all(masks[c]) or c == 0


def test_manifest_sharded_index(tmp_path):
    """Manifest build + strided host shards: disjoint cover with
    DistributedSampler-style wrap padding, deterministic epoch shuffles."""
    from grove_tpu.data.index import (ShardedKeyIndex, build_manifest,
                                      read_manifest)
    ann = tmp_path / "ann"
    ann.mkdir()
    n = 11
    for i in range(n):
        (ann / f"vid{i:04d}.pkl").write_bytes(b"x")
    (ann / "notes.txt").write_bytes(b"skip me")
    man = str(tmp_path / "manifest.txt")
    assert build_manifest(str(ann), man) == n

    world = 4
    shards = [read_manifest(man, r, world) for r in range(world)]
    per = -(-n // world)
    assert all(len(s) == per for s in shards)
    flat = [k for s in shards for k in s]
    # every key covered; exactly per*world - n wrap-duplicates
    assert set(flat) == {f"vid{i:04d}" for i in range(n)}
    assert len(flat) - len(set(flat)) == per * world - n
    # shards are strided: rank r holds keys r, r+world, ...
    assert shards[1][0] == "vid0001" and shards[1][1] == "vid0005"

    idx = ShardedKeyIndex(man, rank=2, world=world, seed=7)
    e0a, e0b, e1 = (idx.epoch_keys(0), idx.epoch_keys(0), idx.epoch_keys(1))
    assert e0a == e0b            # deterministic per epoch
    assert sorted(e0a) == sorted(e1)
    assert e0a != e1             # reshuffled across epochs


def test_howto_dataset_manifest_shard(tmp_path):
    """HowTo100MDataset loads only its manifest shard and still serves
    samples; two shards are disjoint."""
    from grove_tpu.data.index import build_manifest
    from grove_tpu.data.datasets.howto100m import HowTo100MDataset
    from grove_tpu.data.synthetic import make_synthetic_howto_dataset
    from grove_tpu.data.video import VideoDecoder

    ann_dir, video_dir, keys = make_synthetic_howto_dataset(
        str(tmp_path), num_videos=4, num_frames=12)
    man = str(tmp_path / "manifest.txt")
    assert build_manifest(ann_dir, man) == 4
    ds = [HowTo100MDataset(ann_dir=ann_dir, video_dir=video_dir,
                           manifest=man, shard_rank=r, shard_world=2,
                           decoder_factory=VideoDecoder, num_frames=4,
                           clip_size=28, sam_size=32, max_phrases=4)
          for r in range(2)]
    assert len(ds[0]) == 2 and len(ds[1]) == 2
    assert not (set(ds[0].keys) & set(ds[1].keys))
    s = ds[1][0]
    assert s["frames_clip"].shape[0] == 4
    assert s["caption"]
