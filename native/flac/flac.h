// Minimal native FLAC decoder (C ABI).
//
// Role in the stack: LibriSpeech/OpenSLR distribute audio as FLAC; this
// environment ships no FLAC decoder, so dataset staging
// (fluidaudio_tpu/registry/datasets.py) could only warn. This library decodes
// the FLAC subset those corpora use — 8/12/16/20/24-bit PCM, constant/
// verbatim/fixed/LPC subframes, rice/rice2 residuals, independent and
// left-side/right-side/mid-side stereo decorrelation — into interleaved
// int16, which rides the framework's int16 PCM transfer path unchanged
// (half the host->device bytes; see utils/audio_source.py).
//
// Reference behavioral contract: the reference reads FLAC via AVAudioFile
// inside AudioConverter (Shared/AudioConverter.swift:60-124); this is the
// TPU-stack equivalent of that OS decoder.

#ifndef FLUIDAUDIO_FLAC_H
#define FLUIDAUDIO_FLAC_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
  FLAC_OK = 0,
  FLAC_ERR_NOT_FLAC = 1,      // missing fLaC magic / no STREAMINFO
  FLAC_ERR_TRUNCATED = 2,     // ran out of bytes mid-stream
  FLAC_ERR_UNSUPPORTED = 3,   // reserved/unsupported header fields
  FLAC_ERR_CORRUPT = 4,       // lost frame sync / invalid subframe
  FLAC_ERR_ALLOC = 5
} FlacStatus;

// Decode an in-memory FLAC stream to interleaved int16 PCM.
// On FLAC_OK, *out_samples is a malloc'd buffer of (*out_frames *
// *out_channels) int16 samples (bits-per-sample > 16 are rounded down to
// 16; < 16 are shifted up), owned by the caller via flac_free.
int flac_decode_int16(const uint8_t* data, size_t size, int16_t** out_samples,
                      uint64_t* out_frames, uint32_t* out_sample_rate,
                      uint32_t* out_channels, uint32_t* out_bits_per_sample);

void flac_free(void* p);

#ifdef __cplusplus
}
#endif

#endif  // FLUIDAUDIO_FLAC_H
