"""Final TGFR evaluation: 1:1 verification (+1:N identification).

TPU-native equivalent of reference src/test.py:
  python src/test.py [--cfg cfg/test.yml]
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    args = setup(parse_args("test.yml", "Testing TGFR model"))
    from text_guided_face_recognition_tpu.engine import prepare as prep
    from text_guided_face_recognition_tpu.engine.evaluate import run_test

    test_dl, test_ds = prep.prepare_dataloader(args, "test")
    if args.en_type == "LSTM":
        args.vocab_size = test_ds.n_words

    text_encoder, text_head = prep.prepare_text_encoder(args)
    backbone = prep.prepare_backbone(args)
    image_head = prep.prepare_image_head(args)
    fusion_net = prep.prepare_fusion_net(args)  # None for concat

    print("\nLet's test the model")
    run_test(args, test_dl, backbone, image_head, fusion_net,
             text_encoder, text_head)


if __name__ == "__main__":
    main()
