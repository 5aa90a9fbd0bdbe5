// First-party Vorbis decoder + Ogg demux — stub, implementation lands
// in this round.
