from text_guided_face_recognition_tpu.models.layers import (  # noqa: F401
    DotProductAttention,
    LayerNormCHW,
    MultiHeadAttention,
    PReLU,
    ProjectionHead,
    ScaledDotProductAttention,
    SelfAttention2D,
    TorchMultiheadAttention,
    l2_normalize,
)
from text_guided_face_recognition_tpu.models.legacy_attention import (  # noqa: F401
    ChannelAttention,
    SpatialAttention,
)
from text_guided_face_recognition_tpu.models.magface import (  # noqa: F401
    SoftmaxBuilder,
    mag_loss,
    network_builder,
)
from text_guided_face_recognition_tpu.models.iresnet import (  # noqa: F401
    IResNet,
    iresnet18,
    iresnet34,
    iresnet50,
    iresnet100,
    iresnet200,
)
from text_guided_face_recognition_tpu.models.irnet import (  # noqa: F401
    IRBackbone,
    build_model,
)
from text_guided_face_recognition_tpu.models.image_heads import (  # noqa: F401
    IMIM,
    ImageHeading,
)
from text_guided_face_recognition_tpu.models.text_bert import (  # noqa: F401
    TextEncoder,
    TextHeading,
    BertWordMapping,
)
from text_guided_face_recognition_tpu.models.text_rnn import RNNEncoder  # noqa: F401
from text_guided_face_recognition_tpu.models.fusion import (  # noqa: F401
    ConcatAttention,
    LinearFusion,
    FCFM,
    ParagraphLevelCFA,
    WordLevelCFA_LSTM,
)
from text_guided_face_recognition_tpu.models.margins import (  # noqa: F401
    AdaFaceHead,
    AddMarginProduct,
    ArcMarginProduct,
    MagLinear,
    SphereProduct,
)
