"""Block registry for the declarative flowgraph compiler.

Analog of grc/blocks/*.xml (the 175 XML block descriptions) + the factory
resolution in grc/base/Block.py: maps flowgraph keys to block factories
with typed parameters.  Keys follow the reference's GRC naming where a
direct analog exists (gr_fir_filter_xxx, blks2_wfm_rcv, ...) with grtpu
aliases.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

BLOCK_REGISTRY: Dict[str, Callable] = {}


def register_block(key: str, factory: Callable = None):
    """Register a block factory under a flowgraph key (decorator-friendly)."""
    if factory is None:
        def deco(f):
            BLOCK_REGISTRY[key] = f
            return f
        return deco
    BLOCK_REGISTRY[key] = factory
    return factory


def _populate():
    from grtpu.blocks import analog, convert, fftblk, filter as fblk, gengen
    from grtpu.blocks import misc, pfb, stream
    from grtpu.blocks.gengen import (
        Add, AddConst, Multiply, MultiplyConst, NoiseSource, NullSink,
        VectorSink, VectorSource,
    )
    from grtpu.digital import blocks as dblocks
    from grtpu.models import channel, fm

    r = register_block
    # gengen / arithmetic
    r("gr_add_xx", Add)
    r("gr_multiply_xx", Multiply)
    r("gr_add_const_vxx", AddConst)
    r("gr_multiply_const_vxx", MultiplyConst)
    r("gr_vector_source_x", VectorSource)
    r("gr_vector_sink_x", VectorSink)
    r("gr_null_sink", NullSink)
    r("gr_noise_source_x", NoiseSource)
    r("gr_sig_source_x", analog.SigSource)
    # filters
    r("gr_fir_filter_xxx", fblk.FirFilter)
    r("gr_fft_filter_xxx", fblk.FftFilter)
    r("gr_interp_fir_filter_xxx", fblk.InterpFirFilter)
    r("gr_freq_xlating_fir_filter_xxx", fblk.FreqXlatingFirFilter)
    r("blks2_rational_resampler_xxx", fblk.RationalResampler)
    r("gr_iir_filter_ffd", fblk.IirFilter)
    r("gr_single_pole_iir_filter_xx", fblk.SinglePoleIir)
    r("gr_hilbert_fc", fblk.Hilbert)
    r("gr_pfb_channelizer_ccf", pfb.PfbChannelizer)
    r("gr_pfb_arb_resampler_ccf", pfb.PfbArbResampler)
    r("gr_pfb_synthesizer_ccf", pfb.PfbSynthesizer)
    # analog
    r("gr_quadrature_demod_cf", analog.QuadratureDemod)
    r("gr_frequency_modulator_fc", analog.FrequencyModulator)
    r("gr_agc2_xx", analog.Agc2)
    r("gr_pll_refout_cc", analog.PllRefout)
    r("gr_simple_squelch_cc", analog.SimpleSquelch)
    # conversions
    r("gr_complex_to_mag", convert.ComplexToMag)
    r("gr_complex_to_arg", convert.ComplexToArg)
    r("gr_float_to_complex", convert.FloatToComplex)
    # stream plumbing
    r("gr_stream_to_vector", stream.StreamToVector)
    r("gr_vector_to_stream", stream.VectorToStream)
    r("gr_keep_one_in_n", stream.KeepOneInN)
    r("gr_delay", stream.Delay)
    r("gr_throttle", stream.Throttle)
    r("gr_head", stream.Head)
    # digital
    r("digital_costas_loop_cc", dblocks.CostasLoop)
    r("digital_binary_slicer_fb", dblocks.BinarySlicer)
    r("gr_diff_encoder_bb", dblocks.DiffEncoder)
    r("gr_diff_decoder_bb", dblocks.DiffDecoder)
    r("digital_constellation_decoder_cb", dblocks.ConstellationDecoder)
    # fft / spectral
    r("gr_fft_vxx", fftblk.FftVcc)
    r("blks2_logpwrfft_x", fftblk.LogPwrFft)
    # models
    r("blks2_wfm_rcv", fm.WfmRcv)
    r("blks2_wfm_rcv_pll", fm.WfmRcvPll)
    r("blks2_wfm_tx", fm.WfmTx)
    r("blks2_nbfm_rx", fm.NbfmRx)
    r("blks2_nbfm_tx", fm.NbfmTx)
    r("blks2_am_demod_cf", fm.AmDemod)
    r("gr_channel_model", channel.ChannelModel)


_populate()
