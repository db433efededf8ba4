"""Stage-1 FCAM pretraining with a BERT-family text encoder.

TPU-native equivalent of reference src/train_encoders_bert.py:
  python src/train_encoders_bert.py [--cfg cfg/train_bert.yml]
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    args = setup(parse_args("train_bert.yml", "Train BERT Encoder"))
    assert args.en_type == "BERT", "use train_encoders_lstm.py for LSTM/GRU"
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    Stage1Trainer(args).main()


if __name__ == "__main__":
    main()
