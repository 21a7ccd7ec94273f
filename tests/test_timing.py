"""Timing/metrics: ASRPerformanceMetrics summary formatting."""

from fluidaudio_tpu.utils.timing import PerformanceMetrics


class TestPerformanceMetricsSummary:
    """PerformanceMetricsTests.swift:10-44."""

    def test_summary_formatting(self):
        m = PerformanceMetrics(
            audio_seconds=14.4,
            preprocess_seconds=0.123,
            encode_seconds=0.456,
            decode_seconds=0.789,
            total_seconds=1.368,
            peak_memory_mb=256.3,
            device_utilization_pct=85.0,
        )
        s = m.summary_text
        for needle in ("0.123", "0.456", "0.789", "1.368", "10.5", "256.3", "85.0%"):
            assert needle in s, f"summary missing {needle}: {s}"

    def test_summary_with_nil_device_stats(self):
        m = PerformanceMetrics(
            audio_seconds=3.0,
            preprocess_seconds=0.1,
            encode_seconds=0.2,
            decode_seconds=0.3,
            total_seconds=0.6,
        )
        assert "N/A" in m.summary_text
        assert m.rtfx == 5.0
