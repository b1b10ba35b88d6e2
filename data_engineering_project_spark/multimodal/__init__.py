from data_engineering_project_spark.multimodal.binary_ops import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_and_featurize,
    sample_frames,
)
