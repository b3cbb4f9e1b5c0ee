#!/usr/bin/env python3
"""Round-2 vector generator: executes the REFERENCE's Python (read-only, at
/root/reference) for the functions added this round and dumps JSON vectors
into src/test/resources. The Scala kernels are pinned against these outputs.

Covered (VERDICT.md "Next round" item 4 + 8):
  - html_generator.detect_text_style (html_generator.py:241-302)
  - html_generator.html_to_markdown  (html_generator.py:585-637; markdownify is
    NOT installed in this sandbox, so the executed path is the documented
    _strip_html_tags fallback -- exactly what the rebuild implements)
  - stroke-width bold / height heading thresholds (layout_analyzer.py:434-442:
    np.median over per-line stroke widths, bold = stroke > 1.3*median,
    heading = height > 1.2*median)
  - page confidence aggregation (ocr_engine.py:690-695: mean of line[1][1]
    for lines with len(line[1]) > 1; exact value emitted as a fraction)
  - edit-distance correction estimate (gemini_corrector.py:438:
    sum(1 for a, b in zip(text, corrected) if a != b) // 5)

loguru is stubbed (not installed here); it is logging-only in the reference.
"""
import json
import os
import sys
import types
from fractions import Fraction

# --- stub loguru (logging only) and make sure markdownify stays absent -----
loguru = types.ModuleType("loguru")


class _Logger:
    def __getattr__(self, name):
        return lambda *a, **k: None


loguru.logger = _Logger()
sys.modules["loguru"] = loguru
assert "markdownify" not in sys.modules
try:
    import markdownify  # noqa: F401
    raise SystemExit("markdownify unexpectedly installed; fallback path not taken")
except ImportError:
    pass

sys.path.insert(0, "/root/reference")
import html_generator  # noqa: E402

assert not html_generator.MARKDOWNIFY_AVAILABLE

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources")

gen = html_generator.HTMLGenerator()

# --- detect_text_style -----------------------------------------------------
style_cases = []
texts = [
    "제1조 총칙",
    "제 12 조 (목적)",
    "제3장 벌칙",
    "제1편 총론",
    "제 2 절 절차",
    "1. 가나다라",
    "一. 서론",
    "二、본론",
    "① 첫째 항목",
    "Ⅰ. 개요",
    "Ⅳ、부칙",
    "일반 본문 텍스트입니다",
    "Short heading",
    "  공백  둘러싼  텍스트  ",
    "1.가 (no space after dot)",
    "x" * 99,
    "y" * 100,
    "제1조 " + "본문 " * 40,  # legal pattern but long (> 100 chars)
    "",
]
fonts = [(36, 20), (35, 20), (28, 20), (27, 20), (24, 20), (23, 20), (20, 20),
         (90, 50), (70, 50), (60, 50), (59, 50), (45, 45), (10, 45),
         (40, 0), (40, -3), (22, 12)]
for text in texts:
    for (f, m) in fonts:
        for bold in (False, True):
            for lc in (1, 2, 3):
                style_cases.append({
                    "text": text, "font_size": f, "median_font_size": m,
                    "is_bold": bold, "line_count": lc,
                    "style": gen.detect_text_style(
                        text, float(f), float(m), is_bold=bold,
                        line_count=lc).value,
                })
with open(os.path.join(OUT, "detect_style_vectors.json"), "w") as fh:
    json.dump(style_cases, fh, ensure_ascii=False, indent=1)
print("detect_text_style:", len(style_cases))

# --- html_to_markdown (markdownify-absent fallback path) -------------------
html_cases = [
    "<h1>제목</h1>",
    "<h1 class=\"text-center\">중앙 제목</h1>",
    "<h2>부제목</h2>\n<h3>소제목</h3>",
    "<p>본문 단락</p>",
    "<p class=\"text-right\">오른쪽</p><p>둘째</p>",
    "<strong>굵게</strong> 그리고 <b>더 굵게</b>",
    "<p><strong>굵은 단락</strong></p>",
    "<br>줄<br/>바꿈<br />끝",
    "<style>body { color: red; }</style><p>스타일 제거</p>",
    "<script>alert('x')</script><p>스크립트 제거</p>",
    "<style type=\"text/css\">a\nb\nc</style>after",
    "<div class=\"page-section\" data-page=\"1\">\n<h1>페이지</h1>\n<p>본문</p>\n</div>",
    "<table class=\"ocr-table\"><tr><th>이름</th><th>값</th></tr><tr><td>가</td><td>1</td></tr></table>",
    "<figure><img src=\"media://x\" alt=\"cap\"/><figcaption>cap</figcaption></figure>",
    "<H1>UPPER TAG</H1>",
    "<h1>multi\nline\nheading</h1>",
    "<p>a</p>\n\n\n\n<p>b</p>",
    "<h2 id=\"x\" data-y=\"1\">attrs</h2>",
    "plain text, no tags",
    "",
    "<p></p>",
    "<div class=\"empty-line\"></div><p>after spacing</p>",
    "<p>&amp; &lt; &gt; &quot; &#x27;</p>",
    "<h1>A</h1><h2>B</h2><h3>C</h3><p>D</p>",
    "<p>one</p><br><strong>two</strong><h3>three</h3>",
]
html_vectors = [{"html": h, "markdown": gen.html_to_markdown(h)} for h in html_cases]
with open(os.path.join(OUT, "html_to_md_vectors.json"), "w") as fh:
    json.dump(html_vectors, fh, ensure_ascii=False, indent=1)
print("html_to_markdown:", len(html_vectors))

# --- stroke-width bold / height heading (layout_analyzer.py:434-456) -------
import numpy as np  # noqa: E402

stroke_cases = []
stroke_sets = [
    [10, 10, 10, 13, 14],          # 13 == 1.3*10 exactly: strict > excludes
    [10, 10, 10, 10, 14],
    [8, 9, 10, 11],                # even count -> np.median averages middle two
    [7],
    [12, 12, 16, 15, 13, 12, 12],
    [10, 11, 12, 13, 14, 15, 16, 26],
    [5, 5, 5, 5, 5, 5],
]
height_sets = [
    [40, 40, 40, 48, 49],          # 48 == 1.2*40 exactly: strict > excludes
    [30, 35, 40, 45],
    [55],
    [40, 41, 42, 60, 39, 38],
]
for strokes in stroke_sets:
    median_stroke = float(np.median(strokes)) if strokes else 1.0
    bold_threshold = median_stroke * 1.3
    stroke_cases.append({
        "strokes": strokes,
        "median2x": int(round(median_stroke * 2)),
        "bold": [s > bold_threshold for s in strokes],
    })
height_cases = []
for heights in height_sets:
    median_height = float(np.median(heights)) if heights else 20
    heading_threshold = median_height * 1.2
    height_cases.append({
        "heights": heights,
        "median2x": int(round(median_height * 2)),
        "heading": [h > heading_threshold for h in heights],
    })
with open(os.path.join(OUT, "stroke_vectors.json"), "w") as fh:
    json.dump({"bold": stroke_cases, "heading": height_cases}, fh, indent=1)
print("stroke/heading:", len(stroke_cases), len(height_cases))

# --- page confidence (ocr_engine.py:690-695) -------------------------------
# results[0] lines are (bbox, (text, conf)) pairs; lines with len(line[1])<=1
# carry no confidence and are skipped. Exact mean emitted as num/den so the
# integer-exact Scala restatement (floor to per-mille) can be checked without
# float-rounding ambiguity.
conf_cases = []
conf_sets = [
    [("a", 0.9), ("b", 0.8)],
    [("a", 0.9), ("b",), ("c", 0.7)],          # middle line has no conf
    [("a",)],                                   # no confidences -> 0.0
    [],
    [("a", 0.333), ("b", 0.333), ("c", 0.334)],
    [("a", 0.999), ("b", 1.0), ("c", 0.998), ("d", 0.5)],
    [("a", 0.0)],
]
for lines in conf_sets:
    confidences = []
    for line in [(None, t) for t in lines]:
        if len(line[1]) > 1:
            confidences.append(line[1][1])
    avg_conf = sum(confidences) / len(confidences) if confidences else 0.0
    # exact rational over per-mille ints (the corpus carries conf as per-mille)
    pm = [int(round(c * 1000)) for c in confidences]
    frac = Fraction(sum(pm), len(pm)) if pm else Fraction(0)
    assert abs(avg_conf * 1000 - float(frac)) < 1e-6
    conf_cases.append({
        "conf_pm": pm,
        "n_lines": len(lines),
        "mean_num": frac.numerator,
        "mean_den": frac.denominator,
        "floor_pm": frac.numerator // frac.denominator if pm else 0,
    })
with open(os.path.join(OUT, "confidence_vectors.json"), "w") as fh:
    json.dump(conf_cases, fh, indent=1)
print("confidence:", len(conf_cases))

# --- edit-distance correction estimate (gemini_corrector.py:438) -----------
edit_cases = []
pairs = [
    ("abcdef", "abcdef"),
    ("abcdef", "abcdeX"),
    ("abcdef", "aXcXeX"),
    ("abcdefghij", "AbCdEfGhIj"),
    ("short", "longer text"),
    ("가나다라마바사", "가나다라마바사"),
    ("가나다라마바사아자차", "가나닥라맏바삭아잗차"),
    ("", "anything"),
    ("same length here!", "same length HERE?"),
]
for text, corrected in pairs:
    edit_cases.append({
        "original": text, "corrected": corrected,
        "estimate": sum(1 for a, b in zip(text, corrected) if a != b) // 5,
    })
with open(os.path.join(OUT, "edit_estimate_vectors.json"), "w") as fh:
    json.dump(edit_cases, fh, ensure_ascii=False, indent=1)
print("edit estimate:", len(edit_cases))
