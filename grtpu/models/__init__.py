from grtpu.models.fm import (
    AmDemod, FmDeemph, FmPreemph, NbfmRx, NbfmTx, WfmRcv, WfmTx,
)
