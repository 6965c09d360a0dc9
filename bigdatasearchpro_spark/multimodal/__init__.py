"""L6 multimodal columns (SURVEY.md §2.10, BASELINE.json [EXT]).

Image/audio/video as opaque ``binary`` payload columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample as
Arrow-batched pandas transforms over ``mapInPandas``. The codec step is
STUBBED (no image/audio libraries in this container) behind
``decode_payload(..., real=True) -> NotImplementedError`` and a
deterministic fake; every Spark-side concern — schema, partitioning,
UDF signature, batch shape — is real and tested.
"""

from bigdatasearchpro_spark.multimodal.assets import (  # noqa: F401
    ASSET_SCHEMA,
    FEATURE_DIM,
    assets_from_documents,
    decode_payload,
    extract_features,
    resize_plan,
    sample_frames,
)
