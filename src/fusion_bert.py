"""Stage-2 FCFM fusion training on top of stage-1 BERT encoders.

TPU-native equivalent of reference src/fusion_bert.py:
  python src/fusion_bert.py [--cfg cfg/fusion_bert.yml]
"""

from _bootstrap import parse_args, setup  # noqa: E402


def main():
    args = setup(parse_args("fusion_bert.yml", "Fusion"))
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    FusionTrainer(args).main()


if __name__ == "__main__":
    main()
