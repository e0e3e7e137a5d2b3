"""Rate-scan parity tests, mirroring RateCalculatorTest.scala."""

from conftest import fixture_text

from gcflow.events import export_to_seq, rate_scan
from gcflow.grammar import parse_log, parse_with_heap_stats


def test_heap_allocated_since_last_event():  # RateCalculatorTest.scala:5-24
    events = parse_log(fixture_text("basic-java7-gc.log"))
    calc = rate_scan(events)
    assert calc[0].bytes_allocated_since_last_event == 66048 * 1024
    assert calc[0].millis_since_last_event == 263
    assert calc[0].heap_allocation_rate() == (66048 * 1024) // 263
    assert calc[0].heap.reclaimed_bytes == (66048 - 59108) * 1024
    assert calc[1].bytes_allocated_since_last_event == 125156 * 1024 - 59108 * 1024
    assert calc[1].millis_since_last_event == 341 - 263
    assert calc[1].heap_allocation_rate() == (125156 * 1024 - 59108 * 1024) // (341 - 263)
    assert calc[1].heap.reclaimed_bytes == (125156 - 122164) * 1024
    assert calc[2].bytes_allocated_since_last_event == 0
    assert calc[2].millis_since_last_event == 371 - 341
    assert calc[3].bytes_allocated_since_last_event == 251862 * 1024 - 119766 * 1024
    assert calc[3].millis_since_last_event == 727 - 371


def test_export_calculated_fields():  # RateCalculatorTest.scala:26-41
    events = parse_log(fixture_text("basic-java8-gc.log"))
    calc = rate_scan(events)
    got = "\n".join(f"({k},{v})" for k, v in export_to_seq(calc[1]))
    assert got == """(age,0.299)
(type,GC)
(cause,Allocation Failure)
(pause,0.0292072)
(heapBefore,125737984)
(heapAfter,122723328)
(heapReclaimed,3014656)
(heapMax,324534272)
(heapAllocated,67108864)
(heapAllocationRate,1048576)
(promotionRate,0)"""


def test_rates_with_heap_stats():  # RateCalculatorTest.scala:43-48
    events = parse_with_heap_stats(fixture_text("heap-java7-gc.log"))
    calc = rate_scan(events)
    assert calc[0].bytes_allocated_since_last_event == 66048 * 1024
    assert calc[1].bytes_allocated_since_last_event == 125149 * 1024 - 59101 * 1024


def test_promotion_rate():  # RateCalculatorTest.scala:50-62
    events = parse_log(fixture_text("details-java7-gc.log"))
    calc = rate_scan(events)
    assert calc[0].promotion_rate() == ((66048 - 10736) - (66048 - 59099)) * 1024 // 266
    assert calc[1].promotion_rate() == ((76784 - 10720) - (125147 - 122163)) * 1024 // (348 - 266)
    assert calc[2].promotion_rate() == 0
    assert calc[2].gc_type == "Full GC"
    assert ("promotionRate", "787730") in export_to_seq(calc[1])


def test_promotion_rate_heap_stats():  # RateCalculatorTest.scala:64-69
    events = parse_with_heap_stats(fixture_text("heap-java7-gc.log"))
    calc = rate_scan(events)
    assert calc[1].promotion_rate() == ((76784 - 10720) - (125149 - 122157)) * 1024 // (342 - 261)
    assert ("promotionRate", "797354") in export_to_seq(calc[1])
