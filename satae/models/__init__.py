from satae.models.encoder import encoder_init, encoder_apply  # noqa: F401
from satae.models.decoder import decoder_init, decoder_apply  # noqa: F401
from satae.models.supervised_ae import (  # noqa: F401
    supervised_ae_init,
    supervised_ae_apply,
)
from satae.models.mlp import mlp_init, mlp_apply  # noqa: F401
