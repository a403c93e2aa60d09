from summarymixing_tpu.losses.ctc import ctc_loss
from summarymixing_tpu.losses.kldiv import kldiv_loss, nll_loss
from summarymixing_tpu.losses.transducer import (
    transducer_loss,
    transducer_loss_chunked,
)

__all__ = ["ctc_loss", "kldiv_loss", "nll_loss", "transducer_loss",
           "transducer_loss_chunked"]
