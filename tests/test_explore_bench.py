"""explore_bench smoke test (SURVEY.md §7 hard-part 6 ledger tool): the
interactivity benchmark runs end-to-end at toy size and emits one parseable
JSON line with the click/render/adaptive latency fields."""

import json

import pytest

from esr_tpu.scripts.explore_bench import main


@pytest.mark.slow
def test_explore_bench_emits_json(capsys):
    main(
        [
            "--cpu", "--nb", "1", "--lr_size", "16",
            "--regions", "4", "--n_steps", "4", "--iters", "2",
            "--alternatives", "2",
        ]
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "explore_click_latency"
    assert rec["value"] > 0
    (click,) = rec["clicks"]
    assert click["region_lr"] == 4
    assert click["steps_per_s"] > 0 and click["first_s"] >= click["click_s"]
    assert rec["render_s"]["repeat"] > 0
    assert rec["adaptive_imprint"]["rounds"] >= 1
    alt = rec["alternatives"]
    assert alt["k"] == 2 and alt["first_s"] >= alt["repeat_s"] > 0
    assert rec["platform"] == "cpu"
