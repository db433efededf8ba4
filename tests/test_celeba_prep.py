"""Drive the CelebA prep pipeline (tools/celeba_prep/) end-to-end on a
synthetic corpus and validate every output format — including against the
reference's SHIPPED pickles (/root/reference/data/celeba/*/; reference
scripts: data/celeba/scripts/*.py)."""

import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools", "celeba_prep"))

import create_train_test_filenames as ctf  # noqa: E402
import make_final_img_txt as mfit  # noqa: E402
import make_images_folder as mif  # noqa: E402
import test_list_identification as tli  # noqa: E402
import transform_fair as tf  # noqa: E402

REF_CELEBA = "/root/reference/data/celeba"

N_ID = 9
TRAIN, VALID = 4, 2  # -> test = 3


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic raw corpus + the full pipeline run."""
    root = tmp_path_factory.mktemp("celeba")
    rng = np.random.default_rng(0)

    # raw: files named <idx>.jpg/.txt, mapping idx -> orig jpg -> identity
    raw_img = root / "img_raw"
    raw_txt = root / "txt_raw"
    raw_img.mkdir()
    raw_txt.mkdir()
    mapping = ["header idx orig\n"]
    identity = []
    idx = 0
    for ident in range(N_ID):
        for k in range(int(rng.integers(1, 7))):
            orig = f"{100000 + idx:06d}.jpg"
            mapping.append(f"{idx} {100000 + idx:06d}.jpg\n")
            identity.append(f"{orig} {ident}\n")
            arr = rng.integers(0, 255, (64 + ident, 48 + k, 3)).astype("uint8")
            Image.fromarray(arr).save(raw_img / f"{idx}.jpg")
            (raw_txt / f"{idx}.txt").write_text(
                f"caption for identity {ident} image {k}")
            idx += 1
    (root / "mapping.txt").write_text("".join(mapping))
    (root / "identity_CelebA.txt").write_text("".join(identity))

    # 1. regroup by identity (images and captions)
    for src, out in ((raw_img, root / "images"), (raw_txt, root / "text")):
        mif.main(["--src", str(src), "--out", str(out),
                  "--mapping", str(root / "mapping.txt"),
                  "--identity", str(root / "identity_CelebA.txt"), "--copy"])

    # 2. renumber + resize + pad to >=5 images/subject
    mfit.main(["--images", str(root / "images"), "--texts", str(root / "text"),
               "--out_images", str(root / "images_final"),
               "--out_texts", str(root / "text_final")])

    # 3. split pickles
    ctf.main(["--folder", str(root / "text_final"), "--out", str(root / "out"),
              "--train", str(TRAIN), "--valid", str(VALID)])

    # 4. pair list over the "test" identities
    test_dir = root / "images_split_test"
    test_dir.mkdir()
    for ident in range(TRAIN + VALID, N_ID):
        os.symlink(root / "images_final" / str(ident),
                   test_dir / str(ident))
    tli.main(["--img_dir", str(test_dir), "--out", str(root / "pairs.txt"),
              "--imposters", "2"])

    # 5. fairness augmentation over the final images
    tf.main(["--src", str(root / "images_final"),
             "--out", str(root / "trans"), "--seed", "0"])
    return root


def test_regroup_by_identity(corpus):
    idents = sorted(os.listdir(corpus / "images"), key=int)
    assert idents == [str(i) for i in range(N_ID)]
    # every file's caption lives under the same identity
    for ident in idents:
        imgs = {os.path.splitext(n)[0]
                for n in os.listdir(corpus / "images" / ident)}
        txts = {os.path.splitext(n)[0]
                for n in os.listdir(corpus / "text" / ident)}
        assert imgs == txts and imgs


def test_final_images_resized_padded_and_named(corpus):
    for ident in range(N_ID):
        d = corpus / "images_final" / str(ident)
        names = sorted(os.listdir(d), key=lambda x: int(x.split("_")[-1].split(".")[0]))
        assert len(names) >= 5, "subject not padded to >=5 images"
        # shipped-format naming: <id>_<count>.jpg, count from 1
        assert names[0] == f"{ident}_1.jpg"
        for n in names:
            with Image.open(d / n) as im:
                assert im.size == (112, 112)
        t = corpus / "text_final" / str(ident)
        assert len(os.listdir(t)) == len(names)


def test_split_pickles_match_reference_format(corpus):
    out = corpus / "out"
    fn = pickle.load(open(out / "test_filenames.pickle", "rb"))
    ci = pickle.load(open(out / "test_class_info.pickle", "rb"))
    assert len(fn) == len(ci)
    assert all(isinstance(x, str) and "/" in x and "." not in x for x in fn)
    assert {c for c in ci} == set(range(TRAIN + VALID, N_ID))
    # within-class ordering by the trailing _<count> int (shipped property)
    for i in range(len(fn) - 1):
        if ci[i] == ci[i + 1]:
            assert int(fn[i].split("_")[-1]) < int(fn[i + 1].split("_")[-1])

    # cross-check the exact same properties hold for the reference's shipped
    # pickles (format-identity evidence)
    if os.path.isdir(REF_CELEBA):
        ref_fn = pickle.load(
            open(os.path.join(REF_CELEBA, "test", "filenames.pickle"), "rb"))
        assert type(ref_fn) is type(fn) and type(ref_fn[0]) is type(fn[0])
        assert fn[0].count("/") == ref_fn[0].count("/") == 1
        sample = ref_fn[0].split("/")[1]
        ours = fn[0].split("/")[1]
        assert ("_" in sample) == ("_" in ours)
        assert ours.split("_")[1] == sample.split("_")[1] == "1"


def test_pair_list_format(corpus):
    lines = (corpus / "pairs.txt").read_text().strip().split("\n")
    n_test = N_ID - TRAIN - VALID
    assert len(lines) == n_test * (1 + 2)  # 1 genuine + 2 imposters each
    for i, line in enumerate(lines):
        a, b, lab = line.split(" ")
        assert lab in ("0", "1")
        assert a.endswith(".jpg") and b.endswith(".jpg")
        if lab == "1":
            assert a.split("_")[0] == b.split("_")[0]  # same subject
        else:
            assert a.split("_")[0] != b.split("_")[0]
    # structure: each subject contributes genuine first then imposters
    assert [l.split(" ")[2] for l in lines[:3]] == ["1", "0", "0"]


def test_transform_fair_outputs(corpus):
    src = corpus / "images_final" / "0"
    out = corpus / "trans" / "0"
    assert sorted(os.listdir(out)) == sorted(os.listdir(src))
    with Image.open(out / os.listdir(out)[0]) as im:
        assert im.size == (112, 112)
        arr = np.asarray(im)
    assert arr.std() > 0  # non-degenerate augmented output


def test_transform_fair_math():
    """Blur kernel normalization + hue shift round-trip."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    blurred = tf._gaussian_blur3(x, sigma=5.0)
    assert blurred.shape == x.shape
    np.testing.assert_allclose(blurred.mean(), x.mean(), rtol=0.05)
    # hue shift by a full turn is identity
    np.testing.assert_allclose(tf._adjust_hue(x, 1.0), x, atol=1e-5)
    np.testing.assert_allclose(tf._adjust_hue(x, 0.0), x, atol=1e-5)
