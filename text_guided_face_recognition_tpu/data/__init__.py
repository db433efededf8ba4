from text_guided_face_recognition_tpu.data.tokenizers import (  # noqa: F401
    LstmTokenizer,
    Vocabulary,
    build_dictionary,
    get_bert_tokenizer,
)
from text_guided_face_recognition_tpu.data.transforms import (  # noqa: F401
    eval_transform,
    train_transform,
)
from text_guided_face_recognition_tpu.data.datasets import (  # noqa: F401
    TrainDataset,
    TestDataset,
    load_class_id,
    load_filenames,
    load_text_data,
    load_text_data_bert,
)
from text_guided_face_recognition_tpu.data.loader import DataLoader  # noqa: F401
