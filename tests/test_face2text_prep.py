"""Drive the Face2Text prep pipeline (tools/face2text_prep/) end-to-end on a
synthetic corpus and validate outputs against the reference formats —
including the SHIPPED Face2Text pickles (/root/reference/data/face2text/;
reference scripts: data/face2text/scripts/*.py). Mirrors
tests/test_celeba_prep.py for the first dataset."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
P = os.path.join(ROOT, "tools", "face2text_prep")
REF_F2T = "/root/reference/data/face2text"

N_ID = 8
TRAIN, VALID = 4, 2  # -> test = 2


def _run(script, *args):
    r = subprocess.run([sys.executable, os.path.join(P, script), *args],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"{script}: {r.stderr[-1500:]}"
    return r.stdout


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("f2t")
    rng = np.random.default_rng(0)

    # raw jsonl: per-image caption records (1-5 captions per image)
    raw_imgs = root / "img_align_celeba"
    raw_imgs.mkdir()
    recs = []
    identity = []
    idx = 0
    for ident in range(1, N_ID + 1):  # CelebA identities are 1-based
        for k in range(int(rng.integers(1, 5))):
            name = f"{100000 + idx:06d}.jpg"
            identity.append(f"{name} {ident}\n")
            arr = rng.integers(0, 255, (72, 60, 3)).astype("uint8")
            Image.fromarray(arr).save(raw_imgs / name)
            for c in range(int(rng.integers(1, 6))):
                recs.append(json.dumps(
                    {"filename": f"images/{name}",
                     "description": f"person {ident} caption {c}\nwrapped"}))
            idx += 1
    (root / "raw_2.0.jsonl").write_text("\n".join(recs) + "\n")
    (root / "identity_CelebA.txt").write_text("".join(identity))

    _run("prep_data.py", "--raw", str(root / "raw_2.0.jsonl"),
         "--out", str(root / "text_raw"), "--captions_per_image", "4")
    _run("make_identity_folders.py", "--identity",
         str(root / "identity_CelebA.txt"), "--src", str(raw_imgs),
         "--out", str(root / "imgs_by_id"))
    _run("make_identity_folders.py", "--identity",
         str(root / "identity_CelebA.txt"), "--src", str(root / "text_raw"),
         "--out", str(root / "txt_by_id"), "--ext", ".txt")
    _run("make_final_img_txt.py", "--images", str(root / "imgs_by_id"),
         "--texts", str(root / "txt_by_id"),
         "--out_images", str(root / "images" / "all"),
         "--out_texts", str(root / "text"))
    _run("create_train_test_filenames.py", "--images",
         str(root / "images" / "all"), "--out", str(root / "out"),
         "--n_train", str(TRAIN), "--n_valid", str(VALID))
    # pair list over a split dir (reuse the final images as a fake split)
    _run("test_list_identification.py", "--images",
         str(root / "images" / "all"), "--out", str(root / "pairs.txt"),
         "--n_imposters", "3")
    _run("transform.py", "--src", str(root / "images" / "all"),
         "--out", str(root / "trans"), "--size", "144")
    return root


def test_caption_files_exactly_n(corpus):
    files = os.listdir(corpus / "text_raw")
    assert files
    for f in files:
        caps = (corpus / "text_raw" / f).read_text().strip().split("\n")
        assert len(caps) == 4
        assert all("\n" not in c and c for c in caps)


def test_identity_regrouping(corpus):
    idents = sorted(os.listdir(corpus / "imgs_by_id"), key=int)
    assert len(idents) == N_ID
    for ident in idents:
        imgs = {os.path.splitext(n)[0]
                for n in os.listdir(corpus / "imgs_by_id" / ident)}
        txts = {os.path.splitext(n)[0]
                for n in os.listdir(corpus / "txt_by_id" / ident)}
        # every image that has captions is regrouped consistently
        assert txts <= imgs and imgs


def test_final_images_and_min_count(corpus):
    for ident in os.listdir(corpus / "images" / "all"):
        d = corpus / "images" / "all" / ident
        names = os.listdir(d)
        assert len(names) >= 3  # face2text pads to >=3 (reference :70-73)
        for n in names:
            with Image.open(d / n) as im:
                assert im.size == (112, 112)


def test_split_pickles_match_shipped_format(corpus):
    fn = pickle.load(open(corpus / "out" / "test" / "filenames.pickle", "rb"))
    ci = pickle.load(open(corpus / "out" / "test" / "class_info.pickle", "rb"))
    assert len(fn) == len(ci) and fn
    assert all("/" in x and not x.endswith(".jpg") for x in fn)
    assert set(ci) == set(int(i) for i in os.listdir(corpus / "images" / "all")
                          if int(i) >= TRAIN + VALID)

    ref_fn = pickle.load(
        open(os.path.join(REF_F2T, "test", "filenames.pickle"), "rb"))
    assert type(ref_fn) is type(fn) and type(ref_fn[0]) is type(fn[0])
    assert fn[0].count("/") == ref_fn[0].count("/")


def test_pair_list(corpus):
    lines = (corpus / "pairs.txt").read_text().strip().split("\n")
    n_sub = N_ID
    assert len(lines) == n_sub * 4  # 1 genuine + 3 imposters
    for line in lines:
        a, b, lab = line.split(" ")
        assert lab in ("0", "1")


def test_transform_variant(corpus):
    # transform.py writes a flat dir of <stem>_<variant>.jpg files
    files = os.listdir(corpus / "trans")
    assert files
    with Image.open(corpus / "trans" / files[0]) as im:
        assert im.size == (144, 144)
