from text_guided_face_recognition_tpu.ops.attention import (  # noqa: F401
    func_attention,
    damsm_similarity,
)
from text_guided_face_recognition_tpu.ops.losses import (  # noqa: F401
    clip_loss,
    clip_soft_loss,
    cmpc_loss,
    cmpm_loss,
    cosine_similarity,
    cross_entropy_rows,
    focal_loss,
    global_loss,
    kl_loss,
    sent_loss,
    words_loss,
)
from text_guided_face_recognition_tpu.ops.images import (  # noqa: F401
    device_normalize,
)
from text_guided_face_recognition_tpu.ops.margins import (  # noqa: F401
    add_margin_logits,
    arc_margin_logits,
    adaface_logits,
    mag_margin_logits,
    sphere_margin_logits,
)
from text_guided_face_recognition_tpu.ops.wra import (  # noqa: F401
    word_region_alignment_loss,
)
from text_guided_face_recognition_tpu.ops.damsm_pallas import (  # noqa: F401
    damsm_similarity_fused,
    damsm_similarity_pallas,
)
