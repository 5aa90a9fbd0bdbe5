// First-party ALAC (Apple Lossless) decoder + MP4/CAF demux — stub,
// implementation lands in this round.
