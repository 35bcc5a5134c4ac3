"""ltesniffer_tpu — TPU-native LTE downlink/uplink sniffing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SysSec-KAIST/LTESniffer (see SURVEY.md): PSS/SSS sync, OFDM/SC-FDMA
demodulation, LS channel estimation + MIMO equalization (TM1-4), FALCON-style
blind PDCCH/DCI search with batched Viterbi decoding, rate-matched turbo
decoding with HARQ soft combining up to 256QAM, per-RNTI tracking databases,
and MAC-LTE pcap + security-API output.

Compute path: batched, jitted JAX (XLA on TPU) with Pallas kernels for the
hot loops.  Host path: Python orchestration + NumPy for the light sequential
bookkeeping (DCI acceptance resolve, trackers, ASN.1, pcap), mirroring the
reference's split between its C++ app layer and its SIMD DSP library.
"""

__version__ = "0.1.0"
