from text_guided_face_recognition_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_data_mesh,
    make_mesh,
    prefetch_to_device,
    replicated,
    shard_batch,
)
from text_guided_face_recognition_tpu.parallel.contrastive import (  # noqa: F401
    gather_global_negatives,
    psum_mean,
)
