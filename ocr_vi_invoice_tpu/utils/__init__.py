from ocr_vi_invoice_tpu.utils.config import (  # noqa: F401
    DetModelConfig,
    RecModelConfig,
    DetTrainConfig,
    RecTrainConfig,
    PostProcessConfig,
    PipelineConfig,
)
