"""Single-line + whole-fixture grammar parity tests.

Each test mirrors a reference assertion (cited as ParserTest.scala:line);
fixtures in tests/fixtures are the reference corpus ported verbatim per
FIXTURES.md §2.
"""

from conftest import fixture_text

from gcflow.events import (
    AppPausedEvent,
    BasicGCEvent,
    CmsGcEvent,
    DetailedGCEvent,
    GenerationDelta,
    SizeDelta,
    TenuringDistribution,
    export_to_seq,
    to_bytes,
)
from gcflow.grammar import (
    NEED_ANOTHER_LINE,
    SKIP_LINE,
    Ctx,
    gc_line,
    heap_stat,
    incremental_parse,
    metaspace_stat,
    parse_log,
    parse_with_heap_stats,
    size_stats,
)

FULL_GC_LINE = (
    "2015-12-04T16:07:12.422+1100: 6994.482: [Full GC [PSYoungGen: 14194K->0K(1376448K)]"
    " [ParOldGen: 2788303K->1802287K(2796224K)] 2802498K->1802287K(4172672K)"
    " [PSPermGen: 66560K->66131K(132736K)], 3.8232380 secs]"
    " [Times: user=10.81 sys=0.06, real=3.83 secs]"
)


def parse_line(line):
    r = gc_line(Ctx(line), 0)
    assert r is not None, f"failed to parse: {line!r}"
    return r[0]


def test_full_gc_parsed():  # ParserTest.scala:11-20
    v = parse_line(FULL_GC_LINE)
    assert isinstance(v, BasicGCEvent)
    # 2015-12-04T16:07:12.422+1100 → epoch ms at UTC
    assert v.time == (1449205632422, 660)
    assert v.jvm_age_seconds == 6994.482
    assert v.gc_type == "Full GC"
    assert v.heap_delta == SizeDelta("2802498K", "1802287K", "4172672K")
    assert v.pause_seconds == 3.823238


def test_full_gc_export_golden():  # ParserTest.scala:22-46
    v = parse_line(FULL_GC_LINE)
    got = "\n".join(f"({k},{val})" for k, val in export_to_seq(v))
    assert got == """(datetime,2015-12-04 16:07:12.422)
(age,6994.482)
(type,Full GC)
(pause,3.823238)
(heapBefore,2869757952)
(heapAfter,1845541888)
(heapReclaimed,1024216064)
(heapMax,4272816128)
(PSYoungGenBefore,14534656)
(PSYoungGenAfter,0)
(PSYoungGenReclaimed,14534656)
(PSYoungGenMax,1409482752)
(ParOldGenBefore,2855222272)
(ParOldGenAfter,1845541888)
(ParOldGenReclaimed,1009680384)
(ParOldGenMax,2863333376)
(PSPermGenBefore,68157440)
(PSPermGenAfter,67718144)
(PSPermGenReclaimed,439296)
(PSPermGenMax,135921664)"""


def test_minor_collection_promoted():  # ParserTest.scala:48-53
    line = (
        "2015-12-28T13:50:37.116-1000: 0.251: [GC (Allocation Failure)"
        " [PSYoungGen: 65536K->10736K(76288K)] 65536K->57253K(251392K), 0.0217970 secs]"
        " [Times: user=0.09 sys=0.06, real=0.02 secs]"
    )
    v = parse_line(line)
    assert ("promoted", 47633408) in v.to_export()


def test_cms_event_export_golden():  # ParserTest.scala:55-64
    line = (
        "2015-05-26T16:23:08.447-0200: 65.550: [GC (CMS Final Remark)"
        " [YG occupancy: 387920 K (613440 K)]65.550: [Rescan (parallel) , 0.0085125 secs]"
        "65.559: [weak refs processing, 0.0000243 secs]65.559: [class unloading, 0.0013120 secs]"
        "65.560: [scrub symbol table, 0.0008345 secs]65.561: [scrub string table, 0.0001759 secs]"
        "[1 CMS-remark: 10812086K(11901376K)] 11200006K(12514816K), 0.0110730 secs]"
        " [Times: user=0.06 sys=0.00, real=0.01 secs]"
    )
    v = parse_line(line)
    assert isinstance(v, CmsGcEvent)
    got = "\n".join(f"({k},{val})" for k, val in export_to_seq(v))
    assert got == """(datetime,2015-05-26 16:23:08.447)
(age,65.55)
(type,GC)
(cause,CMS Final Remark)
(pause,0.01)"""


def test_size_stats():  # ParserTest.scala:72-75
    r = size_stats(Ctx("14194K->0K(1376448K)"), 0)
    assert r[0] == SizeDelta("14194K", "0K", "1376448K")


def test_promotion_failure():  # ParserTest.scala:83-89
    line = (
        "2015-12-10T15:42:08.076+1100: 523890.136: [GC--"
        " [PSYoungGen: 1275256K->1275256K(1275264K)] 4007798K->4071477K(4071488K),"
        " 0.3913740 secs] [Times: user=0.54 sys=0.00, real=0.39 secs]"
    )
    v = parse_line(line)
    assert v.gc_type == "GC--"
    assert v.pause_seconds == 0.391374


def test_multiline_young_gen():  # ParserTest.scala:91-102
    lines = (
        "2015-12-10T15:43:18.274+1100: 523960.334: [GC\n"
        "Desired survivor size 129368064 bytes, new threshold 3 (max 15)\n"
        " [PSYoungGen: 1220800K->88639K(1260480K)] 3440993K->2372792K(4056704K),"
        " 0.1104060 secs] [Times: user=0.24 sys=0.01, real=0.12 secs]\n"
    )
    v = parse_line(lines)
    assert v.heap_delta == SizeDelta("3440993K", "2372792K", "4056704K")
    assert v.generation_deltas == [
        GenerationDelta("PSYoungGen", SizeDelta("1220800K", "88639K", "1260480K"))
    ]
    assert v.pause_seconds == 0.110406


def test_fragment_multiple_events():  # ParserTest.scala:104-111
    events = parse_log(fixture_text("fragment.txt"), types=(BasicGCEvent,))
    assert events[0].gc_type == "GC"
    assert events[1].gc_type == "Full GC"
    assert events[0].time == (1449722814299 - 1449722814299 % 1, 660)  # +1100
    assert len(events) == 2


def test_gc_cause():  # ParserTest.scala:113-121
    v = parse_line("0.235: [GC (Allocation Failure)  65536K->57255K(251392K), 0.0222615 secs]")
    assert v.gc_cause == "Allocation Failure"


def test_metaspace_generation():  # ParserTest.scala:123-126
    v = parse_line(
        "2015-12-28T13:50:37.214-1000: 0.349: [Full GC (Ergonomics)"
        " [PSYoungGen: 10720K->0K(141824K)] [ParOldGen: 109101K->117471K(290816K)]"
        " 119821K->117471K(432640K), [Metaspace: 4082K->4082K(1056768K)], 0.2284721 secs]"
        " [Times: user=1.42 sys=0.02, real=0.23 secs]"
    )
    meta = next(d for d in v.generation_deltas if d.name == "Metaspace")
    assert meta == GenerationDelta("Metaspace", SizeDelta("4082K", "4082K", "1056768K"))


def test_basic_java7_counts():  # ParserTest.scala:128-136
    events = parse_log(fixture_text("basic-java7-gc.log"), types=(BasicGCEvent,))
    assert len(events) == 7
    assert events[0].jvm_age_seconds == 0.263
    assert events[0].pause_seconds == 0.022292
    assert events[6].jvm_age_seconds == 2.832
    assert events[6].pause_seconds == 0.022377


def test_details_java7_counts():  # ParserTest.scala:138-141
    assert len(parse_log(fixture_text("details-java7-gc.log"))) == 7


def test_heap_java7_counts():  # ParserTest.scala:143-147
    events = parse_log(fixture_text("heap-java7-gc.log"), types=(BasicGCEvent,))
    assert len(events) == 7
    assert events[-1].jvm_age_seconds == 2.86


def test_basic_java8_counts():  # ParserTest.scala:149-157
    events = parse_log(fixture_text("basic-java8-gc.log"), types=(BasicGCEvent,))
    assert len(events) == 7
    assert events[0].jvm_age_seconds == 0.235
    assert events[0].pause_seconds == 0.0222615
    assert events[6].jvm_age_seconds == 2.232
    assert events[6].pause_seconds == 0.0209706


def test_details_java8_counts():  # ParserTest.scala:159-162
    assert len(parse_log(fixture_text("details-java8-gc.log"))) == 7


def test_heap_java8_counts():  # ParserTest.scala:164-168
    events = parse_log(fixture_text("heap-java8-gc.log"), types=(BasicGCEvent,))
    assert len(events) == 7
    assert events[-1].jvm_age_seconds == 2.198


def test_parnew_tenuring():  # ParserTest.scala:170-180
    text = (
        "7.524: [GC (Allocation Failure) 7.524: [ParNew\n"
        "Desired survivor size 53673984 bytes, new threshold 6 (max 6)\n"
        "- age   1:    5714984 bytes,    5714984 total\n"
        ": 838848K->5616K(943680K), 0.0118666 secs] 838848K->5616K(943744K), 0.0119520 secs]"
        " [Times: user=0.01 sys=0.01, real=0.01 secs]\n"
    )
    events = parse_log(text, types=(BasicGCEvent,))
    assert events[0].jvm_age_seconds == 7.524
    assert events[0].pause_seconds == 0.011952


def test_cms_full_gc():  # ParserTest.scala:182-189
    text = (
        "29517.100: [Full GC (Allocation Failure) 29517.100:"
        " [CMS: 819199K->819199K(819200K), 3.2809595 secs] 1762879K->1762879K(1762880K),"
        " [Metaspace: 21995K->21995K(1069056K)], 3.2810538 secs]"
        " [Times: user=3.28 sys=0.00, real=3.28 secs]"
    )
    events = parse_log(text, types=(BasicGCEvent,))
    assert events[0].jvm_age_seconds == 29517.1
    assert events[0].pause_seconds == 3.2810538
    assert events[0].generation_deltas[0] == GenerationDelta(
        "CMS", SizeDelta("819199K", "819199K", "819200K")
    )


def test_cms_region():  # ParserTest.scala:191-199
    r = heap_stat(
        Ctx(
            "concurrent mark-sweep generation total 64K, used 0K"
            " [0x000000078e000000, 0x000000078e010000, 0x00000007c0000000)\n"
        ),
        0,
    )
    v = r[0]
    assert v.name == "concurrent mark-sweep generation"
    assert v.capacity == "64K"
    assert v.used == "0K"
    assert v.subspaces == []


def test_metaspace_region():  # ParserTest.scala:201-211
    text = (
        " Metaspace       used 12441K, capacity 12616K, committed 12928K, reserved 1060864K\n"
        "  class space    used 1488K, capacity 1562K, committed 1664K, reserved 1048576K\n"
    )
    v = metaspace_stat(Ctx(text), 0)[0]
    assert v.name == "Metaspace"
    assert v.capacity == "12616K"
    assert v.used == "12441K"
    assert len(v.subspaces) == 1
    assert v.subspaces[0].name == "class space"
    assert v.subspaces[0].capacity == "1562K"
    assert v.subspaces[0].used == "1488K"


def test_par_new_region():  # ParserTest.scala:213-225
    text = (
        " par new generation   total 943680K, used 5616K [0x000000072a000000, 0x0000000769ff0000, 0x000000078e000000)\n"
        "  eden space 838848K,   0% used [0x000000072a000000, 0x000000072a000000, 0x000000075d330000)\n"
        "  from space 104832K,   5% used [0x0000000763990000, 0x0000000763f0c180, 0x0000000769ff0000)\n"
        "  to   space 104832K,   0% used [0x000000075d330000, 0x000000075d330000, 0x0000000763990000)\n"
    )
    v = heap_stat(Ctx(text), 0)[0]
    assert v.name == "par new generation"
    assert v.capacity == "943680K"
    assert v.used == "5616K"
    assert len(v.subspaces) == 3


def test_par_old_gen_region_object_filtered():  # ParserTest.scala:227-237
    text = (
        " ParOldGen       total 2796224K, used 2590524K [0x0000000700000000, 0x00000007aaab0000, 0x00000007aaab0000)\n"
        "  object space 2796224K, 92% used [0x0000000700000000,0x000000079e1cf2a8,0x00000007aaab0000)\n"
    )
    v = heap_stat(Ctx(text), 0)[0]
    assert v.name == "ParOldGen"
    assert v.subspaces == []


def test_psyounggen_region_percent_used():  # ParserTest.scala:239-259
    text = (
        " PSYoungGen      total 1070400K, used 1070376K [0x00000007aaab0000, 0x0000000800000000, 0x0000000800000000)\n"
        "  eden space 910272K, 100% used [0x00000007aaab0000,0x00000007e23a0000,0x00000007e23a0000)\n"
        "  from space 160128K, 99% used [0x00000007e23a0000,0x00000007ebffa2f8,0x00000007ec000000)\n"
        "  to   space 254848K, 0% used [0x00000007f0720000,0x00000007f0720000,0x0000000800000000)\n"
    )
    v = heap_stat(Ctx(text), 0)[0]
    subs = [(s.name, s.capacity, s.used) for s in v.subspaces]
    assert subs == [
        ("eden", "910272K", "100%"),
        ("from", "160128K", "99%"),
        ("to", "254848K", "0%"),
    ]


def test_heap_stats_fragment():  # ParserTest.scala:261-309
    events = parse_with_heap_stats(fixture_text("fragment.txt"))
    assert len(events) == 2
    got = "\n".join(
        f"RegionDelta({r.name},{r.start},{r.end},{r.start_capacity},{r.end_capacity})"
        for r in events[0].regions
    )
    assert got == """RegionDelta(PSYoungGen,1070376K,76319K,1070400K,1155840K)
RegionDelta(eden,100%,0%,910272K,900992K)
RegionDelta(from,99%,29%,160128K,254848K)
RegionDelta(to,0%,0%,254848K,242240K)
RegionDelta(ParOldGen,2590524K,2731841K,2796224K,2796224K)
RegionDelta(PSPermGen,67601K,67601K,67648K,67648K)"""
    got1 = "\n".join(f"({k},{v})" for k, v in export_to_seq(events[1]))
    assert got1 == """(datetime,2015-12-10 15:46:54.493)
(age,524176.553)
(type,Full GC)
(pause,2.324499)
(heapBefore,2875555840)
(heapAfter,2122715136)
(heapReclaimed,752840704)
(heapMax,4046913536)
(PSYoungGenBefore,78150656)
(PSYoungGenAfter,0)
(PSYoungGenReclaimed,78150656)
(PSYoungGenMax,1183580160)
(ParOldGenBefore,2797405184)
(ParOldGenAfter,2122715136)
(ParOldGenReclaimed,674690048)
(ParOldGenMax,2863333376)
(PSPermGenBefore,69223424)
(PSPermGenAfter,69223424)
(PSPermGenReclaimed,0)
(PSPermGenMax,69271552)
(PSYoungGenCapacityBefore,1183580160)
(PSYoungGenCapacityAfter,1183580160)
(edenBefore,0)
(edenAfter,0)
(edenCapacityBefore,922615808)
(edenCapacityAfter,922615808)
(fromBefore,29)
(fromAfter,0)
(fromCapacityBefore,260964352)
(fromCapacityAfter,260964352)
(toBefore,0)
(toAfter,0)
(toCapacityBefore,248053760)
(toCapacityAfter,248053760)
(ParOldGenCapacityBefore,2863333376)
(ParOldGenCapacityAfter,2863333376)
(PSPermGenCapacityBefore,69271552)
(PSPermGenCapacityAfter,69271552)"""


def test_cms_heap_stats():  # ParserTest.scala:311-321
    events = parse_with_heap_stats(fixture_text("cms-fragment.txt"))
    assert len(events) == 1
    got = "\n".join(
        f"RegionDelta({r.name},{r.start},{r.end},{r.start_capacity},{r.end_capacity})"
        for r in events[0].regions
    )
    assert got == """RegionDelta(par new generation,838848K,5616K,943680K,943680K)
RegionDelta(eden,100%,0%,838848K,838848K)
RegionDelta(from,0%,5%,104832K,104832K)
RegionDelta(to,0%,0%,104832K,104832K)
RegionDelta(concurrent mark-sweep generation,0K,0K,64K,64K)
RegionDelta(Metaspace,12441K,12441K,12616K,12616K)
RegionDelta(class space,1488K,1488K,1562K,1562K)"""


def test_incremental_prompts_for_more():  # ParserTest.scala:323-334
    lines = (
        "29.538: [GC (Allocation Failure) 29.538: [ParNew\n"
        "Desired survivor size 53673984 bytes, new threshold 1 (max 6)\n"
        "- age   1:   93762072 bytes,   93762072 total\n"
        ": 907401K->104832K(943680K), 0.3764651 secs] 907401K->176460K(1017644K),"
        " 0.3765675 secs] [Times: user=0.91 sys=0.19, real=0.38 secs]\n"
    ).split("\n")
    assert incremental_parse("\n".join(lines[:1])) == NEED_ANOTHER_LINE
    assert incremental_parse("\n".join(lines[:2])) == NEED_ANOTHER_LINE
    assert incremental_parse("\n".join(lines[:3])) == NEED_ANOTHER_LINE
    assert isinstance(incremental_parse("\n".join(lines[:4])), BasicGCEvent)


def test_incremental_skips_unparseable():  # ParserTest.scala:336-343
    l0 = "Total time for which application threads were stopped: 0.0132040 seconds"
    assert incremental_parse(l0) == SKIP_LINE
    assert isinstance(incremental_parse(FULL_GC_LINE), BasicGCEvent)


def test_incremental_skips_matching_prefix():  # ParserTest.scala:345-352
    assert incremental_parse("28922.782: rubbish that's longish") == SKIP_LINE
    line = (
        "28930.272: [Full GC (Allocation Failure) 28930.272:"
        " [CMS: 819200K->819199K(819200K), 3.1445149 secs] 1762880K->1289710K(1762880K),"
        " [Metaspace: 21984K->21984K(1069056K)], 3.1446281 secs]"
        " [Times: user=3.14 sys=0.00, real=3.14 secs]"
    )
    assert isinstance(incremental_parse(line), BasicGCEvent)


def test_incremental_bump_along():  # ParserTest.scala:354-363
    lines = fixture_text("fragment.txt").split("\n")
    assert incremental_parse("\n".join(lines[:1])) == SKIP_LINE
    assert incremental_parse("\n".join(lines[1:2])) == NEED_ANOTHER_LINE
    assert incremental_parse("\n".join(lines[1:22])) == NEED_ANOTHER_LINE
    assert isinstance(incremental_parse("\n".join(lines[1:23])), DetailedGCEvent)
    assert incremental_parse("\n".join(lines[23:24])) == SKIP_LINE
    assert isinstance(incremental_parse("\n".join(lines[33:34])), BasicGCEvent)


def test_incremental_heap_stats_golden():  # ParserTest.scala:365-405
    lines = fixture_text("fragment.txt").split("\n")
    event = incremental_parse("\n".join(lines[1:23]))
    got = "\n".join(f"({k},{v})" for k, v in export_to_seq(event))
    assert got == """(datetime,2015-12-10 15:46:54.299)
(age,524176.359)
(type,GC)
(pause,0.18402)
(heapBefore,3748762624)
(heapAfter,2875555840)
(heapReclaimed,873206784)
(heapMax,4046913536)
(PSYoungGenBefore,1096065024)
(PSYoungGenAfter,78150656)
(PSYoungGenReclaimed,1017914368)
(PSYoungGenMax,1183580160)
(promoted,144707584)
(desiredSurvivorSize,248053760)
(newThreshold,1)
(PSYoungGenCapacityBefore,1096089600)
(PSYoungGenCapacityAfter,1183580160)
(edenBefore,100)
(edenAfter,0)
(edenCapacityBefore,932118528)
(edenCapacityAfter,922615808)
(fromBefore,99)
(fromAfter,29)
(fromCapacityBefore,163971072)
(fromCapacityAfter,260964352)
(toBefore,0)
(toAfter,0)
(toCapacityBefore,260964352)
(toCapacityAfter,248053760)
(ParOldGenBefore,2652696576)
(ParOldGenAfter,2797405184)
(ParOldGenCapacityBefore,2863333376)
(ParOldGenCapacityAfter,2863333376)
(PSPermGenBefore,69223424)
(PSPermGenAfter,69223424)
(PSPermGenCapacityBefore,69271552)
(PSPermGenCapacityAfter,69271552)"""


def test_incremental_cms_allocation_failure():  # ParserTest.scala:408-418
    line = (
        "28892.707: [GC (Allocation Failure) 28892.707: [ParNew: 943680K->943680K(943680K),"
        " 0.0000217 secs]28892.708: [CMS: 745269K->789117K(819200K), 2.5351516 secs]"
        " 1688949K->789117K(1762880K), [Metaspace: 21984K->21984K(1069056K)], 2.5433119 secs]"
        " [Times: user=2.23 sys=0.01, real=2.54 secs]"
    )
    event = incremental_parse(line)
    assert GenerationDelta("CMS", SizeDelta("745269K", "789117K", "819200K")) in event.generation_deltas
    line2 = (
        "28960.533: [Full GC (Allocation Failure) 28960.533: [CMS: 819199K->819199K(819200K),"
        " 3.5242634 secs] 1762879K->1538758K(1762880K), [Metaspace: 21984K->21984K(1069056K)],"
        " 3.5243652 secs] [Times: user=3.52 sys=0.00, real=3.52 secs] "
    )
    event2 = incremental_parse(line2)
    assert GenerationDelta("CMS", SizeDelta("819199K", "819199K", "819200K")) in event2.generation_deltas


def test_plumbr_serial():  # ParserTest.scala:430-447
    text = (
        "2015-05-26T14:45:37.987-0200: 151.126: [GC (Allocation Failure) 151.126:"
        " [DefNew: 629119K->69888K(629120K), 0.0584157 secs] 1619346K->1273247K(2027264K),"
        " 0.0585007 secs] [Times: user=0.06 sys=0.00, real=0.06 secs]\n"
        "2015-05-26T14:45:59.690-0200: 172.829: [GC (Allocation Failure) 172.829:"
        " [DefNew: 629120K->629120K(629120K), 0.0000372 secs]172.829:"
        " [Tenured: 1203359K->755802K(1398144K), 0.1855567 secs] 1832479K->755802K(2027264K),"
        " [Metaspace: 6741K->6741K(1056768K)], 0.1856954 secs]"
        " [Times: user=0.18 sys=0.00, real=0.18 secs]"
    )
    events = parse_log(text, types=(BasicGCEvent,))
    assert len(events) == 2
    assert events[0].jvm_age_seconds == 151.126
    assert events[0].pause_seconds == 0.0585007
    assert events[0].heap_delta == SizeDelta("1619346K", "1273247K", "2027264K")
    assert len(events[0].generation_deltas) == 1
    assert events[1].jvm_age_seconds == 172.829
    assert events[1].pause_seconds == 0.1856954
    assert events[1].heap_delta == SizeDelta("1832479K", "755802K", "2027264K")
    assert [g.name for g in events[1].generation_deltas] == ["DefNew", "Tenured", "Metaspace"]


def test_plumbr_parallel_promoted():  # ParserTest.scala:449-466
    text = (
        "2015-05-26T14:27:40.915-0200: 116.115: [GC (Allocation Failure)"
        " [PSYoungGen: 2694440K->1305132K(2796544K)] 9556775K->8438926K(11185152K),"
        " 0.2406675 secs] [Times: user=1.77 sys=0.01, real=0.24 secs]\n"
        "2015-05-26T14:27:41.155-0200: 116.356: [Full GC (Ergonomics)"
        " [PSYoungGen: 1305132K->0K(2796544K)] [ParOldGen: 7133794K->6597672K(8388608K)]"
        " 8438926K->6597672K(11185152K), [Metaspace: 6745K->6745K(1056768K)], 0.9158801 secs]"
        " [Times: user=4.49 sys=0.64, real=0.92 secs]"
    )
    events = parse_log(text, types=(BasicGCEvent,))
    assert len(events) == 2
    assert events[0].gc_type == "GC"
    assert events[0].gc_cause == "Allocation Failure"
    assert events[0].pause_seconds == 0.2406675
    assert events[0].promoted_bytes() == 271459 * 1024
    assert events[1].gc_type == "Full GC"
    assert events[1].gc_cause == "Ergonomics"
    assert [g.name for g in events[1].generation_deltas] == ["PSYoungGen", "ParOldGen", "Metaspace"]
    assert events[1].pause_seconds == 0.9158801


def test_cms_initial_mark():  # ParserTest.scala:468-473
    events = parse_log(
        "2015-05-26T16:23:07.321-0200: 64.425: [GC (CMS Initial Mark)"
        " [1 CMS-initial-mark: 10812086K(11901376K)] 10887844K(12514816K), 0.0001997 secs]"
        " [Times: user=0.00 sys=0.00, real=0.00 secs]",
        types=(CmsGcEvent,),
    )
    assert events[0].gc_type == "GC"
    assert events[0].gc_cause == "CMS Initial Mark"
    assert events[0].pause_seconds == 0.0


def test_cms_concurrent_mark_start():  # ParserTest.scala:475-478
    events = parse_log(
        "2015-05-26T16:23:07.321-0200: 64.425: [CMS-concurrent-mark-start]",
        types=(CmsGcEvent,),
    )
    assert events[0].gc_type == "CMS-concurrent-mark-start"


def test_cms_concurrent_mark():  # ParserTest.scala:480-484
    events = parse_log(
        "2015-05-26T16:23:07.357-0200: 64.460: [CMS-concurrent-mark: 0.035/0.035 secs]"
        " [Times: user=0.07 sys=0.00, real=0.03 secs]",
        types=(CmsGcEvent,),
    )
    assert events[0].gc_type == "CMS-concurrent-mark"
    assert events[0].pause_seconds == 0.03


def test_plumbr_cms_cycle():  # ParserTest.scala:486-510
    text = "\n".join([
        "2015-05-26T16:23:07.321-0200: 64.425: [GC (CMS Initial Mark) [1 CMS-initial-mark: 10812086K(11901376K)] 10887844K(12514816K), 0.0001997 secs] [Times: user=0.00 sys=0.00, real=0.00 secs]",
        "2015-05-26T16:23:07.321-0200: 64.425: [CMS-concurrent-mark-start]",
        "2015-05-26T16:23:07.357-0200: 64.460: [CMS-concurrent-mark: 0.035/0.035 secs] [Times: user=0.07 sys=0.00, real=0.03 secs]",
        "2015-05-26T16:23:07.357-0200: 64.460: [CMS-concurrent-preclean-start]",
        "2015-05-26T16:23:07.373-0200: 64.476: [CMS-concurrent-preclean: 0.016/0.016 secs] [Times: user=0.02 sys=0.00, real=0.02 secs]",
        "2015-05-26T16:23:07.373-0200: 64.476: [CMS-concurrent-abortable-preclean-start]",
        "2015-05-26T16:23:08.446-0200: 65.550: [CMS-concurrent-abortable-preclean: 0.167/1.074 secs] [Times: user=0.20 sys=0.00, real=1.07 secs]",
        "2015-05-26T16:23:08.447-0200: 65.550: [GC (CMS Final Remark) [YG occupancy: 387920 K (613440 K)]65.550: [Rescan (parallel) , 0.0085125 secs]65.559: [weak refs processing, 0.0000243 secs]65.559: [class unloading, 0.0013120 secs]65.560: [scrub symbol table, 0.0008345 secs]65.561: [scrub string table, 0.0001759 secs][1 CMS-remark: 10812086K(11901376K)] 11200006K(12514816K), 0.0110730 secs] [Times: user=0.06 sys=0.00, real=0.01 secs]",
        "2015-05-26T16:23:08.458-0200: 65.561: [CMS-concurrent-sweep-start]",
        "2015-05-26T16:23:08.485-0200: 65.588: [CMS-concurrent-sweep: 0.027/0.027 secs] [Times: user=0.03 sys=0.00, real=0.03 secs]",
        "2015-05-26T16:23:08.485-0200: 65.589: [CMS-concurrent-reset-start]",
        "2015-05-26T16:23:08.497-0200: 65.601: [CMS-concurrent-reset: 0.012/0.012 secs] [Times: user=0.01 sys=0.00, real=0.01 secs]",
    ])
    events = parse_log(text, types=(CmsGcEvent,))
    assert events[0].gc_type == "GC"
    assert events[0].gc_cause == "CMS Initial Mark"
    assert events[0].pause_seconds == 0.0
    assert events[11].gc_type == "CMS-concurrent-reset"
    assert events[11].pause_seconds == 0.01
    assert len(events) == 12


def test_java8_promotion_failure():  # ParserTest.scala:512-519
    events = parse_log(
        "2016-01-28T16:20:24.390+1100: 94045.178: [GC (Allocation Failure) --"
        "[PSYoungGen: 1256250K->1256250K(1256448K)] 4037337K->4052791K(4052992K),"
        " 0.4414726 secs] [Times: user=0.51 sys=0.00, real=0.45 secs]",
        types=(BasicGCEvent,),
    )
    assert events[0].gc_type == "GC--"
    assert events[0].gc_cause == "Allocation Failure"
    assert events[0].pause_seconds == 0.4414726


def test_survivor_ratio():  # ParserTest.scala:521-525
    events = parse_with_heap_stats(fixture_text("fragment.txt"))
    assert events[0].e.tenuring == TenuringDistribution("248053760", "1")


def test_app_stopped_wait_times():  # ParserTest.scala:527-537
    events = parse_log(fixture_text("fragment-with-wait-times.txt"))
    first = events[0]
    assert first.gc_type == "AppStopped"
    assert first.stopped_seconds == 0.0001057
    assert first.seconds_to_stop == 0.0000176
    assert events[15].gc_type == "GC"
    assert len(events) == 16


def test_app_stopped_heap_stats_mode():  # ParserTest.scala:539-547
    events = parse_with_heap_stats(fixture_text("fragment-with-wait-times.txt"))
    assert events[0].gc_type == "AppStopped"
    assert events[15].gc_type == "GC"
    assert len(events) == 16


def test_app_stopped_incremental():  # ParserTest.scala:549-556
    event = incremental_parse(
        "2016-11-10T15:42:24.041+1100: 0.119: Total time for which application threads"
        " were stopped: 0.0001057 seconds, Stopping threads took: 0.0000176 seconds"
    )
    assert isinstance(event, AppPausedEvent)
    assert event.gc_type == "AppStopped"


def test_suffix_expander():  # SuffixExpanderTest.scala:7-9
    assert to_bytes("3K") == 3072
    assert to_bytes("29%") == 29
