/* Inverse text normalization rule engine, C ABI.
 *
 * Native equivalent of the reference's out-of-repo Rust library loaded via
 * dlopen/dlsym("nemo_normalize", ...) (ITN/TextNormalizer.swift:76-133).
 * Covers spoken-form -> written-form rewriting: cardinals, ordinals,
 * decimals, currency, percent, years, and common unit phrases (English).
 */
#ifndef FLUIDAUDIO_ITN_H
#define FLUIDAUDIO_ITN_H

#ifdef __cplusplus
extern "C" {
#endif

/* Normalize `text` (UTF-8) for language `lang` ("en" supported; other
 * languages currently pass through unchanged). Returns a malloc'd UTF-8
 * string the caller must release with nemo_normalize_free. NULL on error. */
char* nemo_normalize(const char* text, const char* lang);

void nemo_normalize_free(char* ptr);

/* 1 when `lang` has grammar coverage. */
int nemo_normalize_supports(const char* lang);

#ifdef __cplusplus
}
#endif

#endif /* FLUIDAUDIO_ITN_H */
