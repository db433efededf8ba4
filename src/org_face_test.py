"""COTS face-model baseline: cosine on raw backbone features (no text).

TPU-native equivalent of reference src/org_face_test.py:
  python src/org_face_test.py [--cfg cfg/test.yml]
Supports model_type in {arcface, adaface, magface}.
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    args = setup(parse_args("test.yml", "Testing COTS face model"))
    from text_guided_face_recognition_tpu.engine import prepare as prep
    from text_guided_face_recognition_tpu.engine.evaluate import org_face_test

    test_dl, test_ds = prep.prepare_dataloader(args, "test")
    if args.en_type == "LSTM":
        args.vocab_size = test_ds.n_words

    print("loading models ...")
    backbone = prep.prepare_backbone(args)
    print("start testing ...")
    args = args.replace(is_roc=True)
    org_face_test(args, test_dl, backbone)


if __name__ == "__main__":
    main()
