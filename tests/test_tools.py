"""Dataset-build tool tests: package_data (images -> features -> HDF5)
and download_data (urls/split) on synthetic local inputs."""

import json
import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import download_data  # noqa: E402
import analyse_communication  # noqa: E402
import package_data  # noqa: E402


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for cls in ("hen", "koala"):
        d = root / cls
        d.mkdir()
        for i in range(3):
            arr = rng.randint(0, 255, (300, 240, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / f"img{i}.jpg"))
    # One unreadable file — must be skipped (utils/package_data.py:198-208).
    (root / "hen" / "broken.jpg").write_bytes(b"not an image")
    return root


def test_package_data_end_to_end(image_tree, tmp_path):
    desc = tmp_path / "descriptions.csv"
    desc.write_text("0,hen,adult female bird\n1,koala,sluggish tailless "
                    "marsupial\n")
    out = tmp_path / "train.hdf5"
    package_data.main([
        "-load_imgs", str(image_tree), "-save_hdf5", str(out),
        "-load_desc", str(desc), "-batch_size", "4"])
    with h5py.File(out) as f:
        # 6 good images; the broken one skipped.
        assert f["Target"].shape == (6,)
        assert sorted(set(f["Target"][:])) == [0, 1]
        assert f["layer4_2"].shape == (6, 1, 512, 8, 8)
        assert f["avgpool_512"].shape == (6, 1, 512)
        assert f["fc"].shape == (6, 1, 1000)
        locs = [loc.decode() for loc in f["Location"][:]]
        assert "img0.jpg" in locs
        # Schema is loadable by the training data loader.
        from multimodalgame_tpu.data.hdf5_loader import load_hdf5
        b = next(iter(load_hdf5(str(out), 4, 0, False)))
        assert b["avgpool_512"].shape == (4, 512)


def test_preprocess_shapes(image_tree):
    path = str(image_tree / "hen" / "img0.jpg")
    arr = package_data.preprocess_image(path)
    assert arr.shape == (3, 227, 227)
    assert -1.0 <= arr.min() and arr.max() <= 1.0


def test_flickr_name():
    # The reference's parse() template keeps the full subdomain, dots and
    # all (reference 76-79).
    url = "http://farm1.static.flickr.com/1/2_abc.jpg"
    assert download_data.flickr_name(url) == "farm1.static_1_2_abc.jpg"
    url2 = "http://farm3.static.flickr.com/2345/678_deadbeef.jpg"
    assert download_data.flickr_name(url2) == \
        "farm3.static_2345_678_deadbeef.jpg"


def test_cmd_urls_and_split(tmp_path):
    # Synthetic fall11-style dump: two synsets, flickr + non-flickr urls.
    dump = tmp_path / "fall11_urls.txt"
    lines = []
    for i in range(30):
        lines.append(f"n01514859_{i}\thttp://farm1.static.flickr.com/"
                     f"{i}/{i}_x.jpg")
        lines.append(f"n01882714_{i}\thttp://farm2.static.flickr.com/"
                     f"{i}/{i}_y.jpg")
        lines.append(f"n01514859_{i}\thttp://other.site.com/{i}.jpg")
    dump.write_text("\n".join(lines) + "\n")

    urls_dir = tmp_path / "urls"
    download_data.main([
        "--cmd_urls", "--load_imagenet_path", str(dump),
        "--save_urls_path", str(urls_dir),
        "--synsets", "n01514859,n01882714", "--classes", "hen,koala",
        "--class_size", "20"])
    hen = (urls_dir / "hen.txt").read_text().strip().split("\n")
    assert len(hen) == 20
    assert all("static.flickr" in u for u in hen)  # non-flickr filtered

    ds_path = tmp_path / "datasets.json"
    download_data.main([
        "--cmd_split", "--load_urls_path", str(urls_dir),
        "--save_datasets_path", str(ds_path),
        "--classes", "hen,koala",
        "--train_size", "10", "--dev_size", "5", "--test_size", "5"])
    ds = json.loads(ds_path.read_text())
    assert set(ds) == {"train", "dev", "test"}
    assert len(ds["train"]["hen"]) == 10
    assert len(ds["dev"]["koala"]) == 5
    # No overlap between splits.
    all_urls = ds["train"]["hen"] + ds["dev"]["hen"] + ds["test"]["hen"]
    assert len(set(all_urls)) == 20


def test_conversation_lengths_stopmask_filter():
    """Per-example length = count of StopMask==1 rows, NOT the batch-level
    row count: the extraction writes trailing StopMask==0 rows for
    early-stopped examples (binary_vectors.py:88-135 is
    batch-synchronous)."""
    dtype = np.dtype([
        ("ExampleId", "S50"), ("AgentId", "S1"), ("Index", "i"),
        ("Target", "i"), ("Rank", "i"),
        ("Predictions", np.float32, (4,)),
        ("StopProb", np.float32, (1,)), ("StopVec", np.float32, (1,)),
        ("StopMask", np.float32, (1,)),
    ])
    rows = []
    # Example a (class 0) stops after 1 round; b (class 0) runs all 3;
    # c (class 1) stops after 2. The batch ran 3 rounds, so every
    # example has 3 rows.
    masks = {b"a": [1, 0, 0], b"b": [1, 1, 1], b"c": [1, 1, 0]}
    tgt = {b"a": 0, b"b": 0, b"c": 1}
    for t in range(3):
        for ex in (b"a", b"b", b"c"):
            rows.append((ex, b"R", 2 * t + 1, tgt[ex], 0,
                         np.zeros(4, np.float32), (0.5,), (1.0,),
                         (float(masks[ex][t]),)))
    preds = np.array(rows, dtype=dtype)
    lengths = analyse_communication.conversation_lengths(preds)
    assert lengths == {0: pytest.approx(2.0), 1: pytest.approx(2.0)}


def test_analyse_communication(synthetic_dataset, tmp_path):
    """Chain: train briefly -> extract bv.hdf5 -> analyse (the reference's
    notebook workload, SURVEY §2#20)."""
    from multimodalgame_tpu.config import (finalize_flags, make_flags,
                                           parse_args)
    from multimodalgame_tpu.train import run
    import analyse_communication as ac

    paths = synthetic_dataset
    argv = ["-experiment_name", "an", "-model_type", "Adaptive",
            "-log_path", str(tmp_path / "logs"),
            "-batch_size", "8", "-batch_size_dev", "4",
            "-rec_w_dim", "8", "-sender_out_dim", "8",
            "-img_h_dim", "16", "-rec_hidden", "16",
            "-baseline_hid_dim", "16", "-max_exchange", "3",
            "-descr_train", paths["descr"], "-descr_dev", paths["descr"],
            "-train_file", paths["train"], "-dev_file", paths["dev"],
            "-wv_dim", "16", "-glove_path", paths["glove"],
            "-log_interval", "100", "-log_dev", "100",
            "-save_after", "1", "-save_interval", "2",
            "-exchange_samples", "0"]
    f = make_flags()
    parse_args(f, argv)
    finalize_flags(f, argv)
    os.makedirs(f.log_path, exist_ok=True)
    run(f, max_steps=3)

    f2 = make_flags()
    parse_args(f2, argv + ["-binary_only"])
    finalize_flags(f2, argv + ["-binary_only"])
    out = run(f2)

    result = ac.analyse(out["binary_output"],
                        out_dir=str(tmp_path / "analysis"))
    assert result["num_communication_rows"] > 0
    assert result["num_examples"] == 24  # 6 classes x 4 dev examples
    assert 1.0 <= result["mean_conversation_length"] <= 3.0
    assert os.path.exists(result["pca_sender_png"])
    assert os.path.exists(result["lengths_png"])


def test_cmd_urls_insufficient_raises(tmp_path):
    dump = tmp_path / "dump.txt"
    dump.write_text("n01514859_0\thttp://farm1.static.flickr.com/1/1_x.jpg\n")
    with pytest.raises(AssertionError):
        download_data.main([
            "--cmd_urls", "--load_imagenet_path", str(dump),
            "--save_urls_path", str(tmp_path / "u"),
            "--synsets", "n01514859", "--classes", "hen",
            "--class_size", "5"])
