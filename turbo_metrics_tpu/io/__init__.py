"""Host-side input: probing, demuxing, bitstream parsing, decoding."""
