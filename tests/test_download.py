"""Gated dataset acquisition: ensure/untar logic with an injected fetcher.

No network access: the fetcher is a fake that writes files locally,
so these tests exercise the gating, idempotence, partial-file cleanup
and archive extraction paths of ``data/download.py``.
"""

import io
import os
import tarfile

import numpy
import pytest

from autoencoder_based_image_compression_tpu.data import download


def test_download_file_gated(tmp_path):
    destination = tmp_path / "file.bin"
    with pytest.raises(download.DownloadRequired, match="--download"):
        download.download_file("http://example.invalid/file.bin",
                               str(destination), allow_download=False)
    assert not destination.exists()


def test_download_file_fetches_once(tmp_path):
    destination = tmp_path / "sub" / "file.bin"
    calls = []

    def fake_fetch(url, dest):
        calls.append(url)
        with open(dest, "wb") as handle:
            handle.write(b"payload")

    assert download.download_file("http://x/f", str(destination), True,
                                  fetcher=fake_fetch)
    assert destination.read_bytes() == b"payload"
    # Second call is a no-op (file exists), even without allow_download.
    assert not download.download_file("http://x/f", str(destination), False,
                                      fetcher=fake_fetch)
    assert calls == ["http://x/f"]


def test_download_file_cleans_partial_on_error(tmp_path):
    destination = tmp_path / "file.bin"

    def broken_fetch(url, dest):
        with open(dest, "wb") as handle:
            handle.write(b"trunc")
        raise OSError("connection reset")

    with pytest.raises(OSError):
        download.download_file("http://x/f", str(destination), True,
                               fetcher=broken_fetch)
    assert not destination.exists()


def test_ensure_kodak_pngs_fetches_all_24(tmp_path):
    fetched = []

    def fake_fetch(url, dest):
        fetched.append(os.path.basename(dest))
        with open(dest, "wb") as handle:
            handle.write(b"png")

    download.ensure_kodak_pngs(str(tmp_path), allow_download=True,
                               fetcher=fake_fetch)
    assert fetched == ["kodim" + str(i + 1).rjust(2, "0") + ".png"
                       for i in range(24)]
    # Idempotent: nothing re-fetched.
    download.ensure_kodak_pngs(str(tmp_path), allow_download=True,
                               fetcher=fake_fetch)
    assert len(fetched) == 24


def test_ensure_svhn_mats_gated_message_names_source(tmp_path):
    with pytest.raises(download.DownloadRequired,
                       match="ufldl.stanford.edu"):
        download.ensure_svhn_mats(str(tmp_path), allow_download=False)


def test_ensure_bsds_images_downloads_and_extracts(tmp_path):
    def fake_fetch(url, dest):
        assert url == download.BSDS_SOURCE_URL
        with tarfile.open(dest, "w:gz") as archive:
            for i in range(100):
                payload = b"jpeg-bytes-%03d" % i
                info = tarfile.TarInfo(f"BSDS300/images/test/{100000 + i}.jpg")
                info.size = len(payload)
                archive.addfile(info, io.BytesIO(payload))

    test_dir = download.ensure_bsds_images(str(tmp_path), allow_download=True,
                                           fetcher=fake_fetch)
    assert sorted(os.listdir(test_dir))[0] == "100000.jpg"
    assert len(os.listdir(test_dir)) == 100
    # Already-extracted short-circuit: a failing fetcher is never called.
    def failing_fetch(url, dest):
        raise AssertionError("should not re-download")

    assert download.ensure_bsds_images(str(tmp_path), allow_download=True,
                                       fetcher=failing_fetch) == test_dir


def test_create_datasets_cli_download_flag(tmp_path, monkeypatch):
    """--download on the svhn subcommand pulls the mats then builds."""
    from autoencoder_based_image_compression_tpu.cli import create_datasets

    rng = numpy.random.default_rng(0)
    digits = rng.integers(0, 256, size=(32, 32, 3, 1300), dtype=numpy.uint8)

    def fake_fetch(url, dest):
        import scipy.io

        scipy.io.savemat(dest, {"X": digits})

    monkeypatch.setattr(download, "_urlretrieve", fake_fetch)
    out = tmp_path / "out"
    create_datasets.main(["svhn", "--source_dir", str(tmp_path / "src"),
                          "--out_dir", str(out), "--download",
                          "--nb_svhn_training", "2000",
                          "--nb_svhn_validation", "100",
                          "--nb_svhn_test", "100"])
    training = numpy.load(out / "svhn" / "training_data.npy")
    assert training.shape == (2000, 3072)
    assert numpy.load(out / "svhn" / "test_data.npy").shape == (100, 3072)
