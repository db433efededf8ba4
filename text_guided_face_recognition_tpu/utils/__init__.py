from text_guided_face_recognition_tpu.utils.metrics import (  # noqa: F401
    calculate_identification_acc,
    calculate_scores,
    cal_accuracy,
    get_tpr,
    roc_metrics,
)
