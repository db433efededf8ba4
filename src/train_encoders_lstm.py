"""Stage-1 FCAM pretraining with a bidirectional LSTM/GRU text encoder.

TPU-native equivalent of reference src/train_encoders_lstm.py:
  python src/train_encoders_lstm.py [--cfg cfg/train_lstm.yml]
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    args = setup(parse_args("train_lstm.yml", "Train LSTM Encoder"))
    assert args.en_type in ("LSTM", "GRU")
    from text_guided_face_recognition_tpu.engine.stage1 import Stage1Trainer
    Stage1Trainer(args).main()


if __name__ == "__main__":
    main()
