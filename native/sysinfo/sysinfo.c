/* Process memory/telemetry shim.
 *
 * Native equivalent of the reference's MachTaskSelfWrapper
 * (MachTaskSelfWrapper/MachTaskSelf.c:5-7 exposing the task port for
 * peak-RSS metrics): reads /proc/self on Linux instead of Mach task info.
 */
#include <stdio.h>
#include <string.h>

/* Peak resident set size in bytes; 0 on failure. */
long long fluidaudio_peak_rss_bytes(void) {
  FILE* f = fopen("/proc/self/status", "r");
  if (!f) return 0;
  char line[256];
  long long kb = 0;
  while (fgets(line, sizeof line, f)) {
    if (strncmp(line, "VmHWM:", 6) == 0) {
      sscanf(line + 6, "%lld", &kb);
      break;
    }
  }
  fclose(f);
  return kb * 1024;
}

/* Current resident set size in bytes; 0 on failure. */
long long fluidaudio_current_rss_bytes(void) {
  FILE* f = fopen("/proc/self/statm", "r");
  if (!f) return 0;
  long long pages = 0, resident = 0;
  if (fscanf(f, "%lld %lld", &pages, &resident) != 2) resident = 0;
  fclose(f);
  return resident * 4096LL;
}
