"""satae — TPU-native hybrid autoencoder–MLP pipeline for satellite image
classification (JAX/XLA/Pallas/pjit re-design of the reference notebook
MatteoGiuseppetti/Hybrid-Autoencoder-MLP-Pipeline-for-Satellite-Image-Classification).

Public API: :func:`satae.api.fit`, :func:`satae.api.encode`,
:func:`satae.api.predict` (see satae/api.py).
"""

__version__ = "0.1.0"

from satae.config import (  # noqa: F401
    AETrainConfig,
    DataConfig,
    EUROSAT_CLASSES,
    MLPTrainConfig,
    ModelConfig,
    PipelineConfig,
    RuntimeConfig,
    default_config,
)


def __getattr__(name):
    # lazy: importing satae must not pull in jax-heavy modules eagerly
    if name in ("SatAEPipeline", "fit", "encode", "predict"):
        from satae import api

        return getattr(api, name)
    raise AttributeError(name)
