from rag_serving_system_tpu.ops.topk import (
    cosine_topk_reference,
    cosine_topk_pallas,
    cosine_topk,
)
