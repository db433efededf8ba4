"""Stage-2 fusion training on top of stage-1 LSTM encoders (linear fusion).

TPU-native equivalent of reference src/fusion_lstm.py:
  python src/fusion_lstm.py [--cfg cfg/fusion_lstm.yml]
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    args = setup(parse_args("fusion_lstm.yml", "Fusion"))
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    FusionTrainer(args).main()


if __name__ == "__main__":
    main()
