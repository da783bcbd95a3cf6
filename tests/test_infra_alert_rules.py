"""infra/alert_rules.yml is a real, loadable Prometheus rules file whose
PromQL references only metrics the serving stack actually exports — and it
stays in sync with the documented set in docs/operations/monitoring.md."""

import re
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parents[1]


def _rules():
    return yaml.safe_load((REPO / "infra" / "alert_rules.yml").read_text())


def test_rules_parse_and_have_required_fields():
    data = _rules()
    rules = [r for g in data["groups"] for r in g["rules"]]
    assert len(rules) == 11
    for r in rules:
        assert r["alert"] and r["expr"], r


def test_rules_match_documented_set():
    doc = (REPO / "docs" / "operations" / "monitoring.md").read_text()
    doc_yaml = re.search(r"```yaml\n(groups:.*?)```", doc, re.S).group(1)
    doc_rules = yaml.safe_load(doc_yaml)
    assert _rules()["groups"] == doc_rules["groups"]


def test_every_semantic_kd_metric_in_rules_is_exported():
    """Each semantic_kd_* metric named in a rule must exist in the live
    metrics catalog (serve/metrics.py) — no aspirational PromQL."""
    from sskd_tpu.serve import metrics as m

    exported = set()
    src = (REPO / "sskd_tpu" / "serve" / "metrics.py").read_text()
    exported |= set(re.findall(r'"(semantic_kd_\w+)"', src))
    # histograms export _bucket/_count/_sum series
    with_suffixes = set(exported)
    for name in exported:
        with_suffixes |= {f"{name}_bucket", f"{name}_count", f"{name}_sum"}
    used = set()
    for g in _rules()["groups"]:
        for r in g["rules"]:
            used |= set(re.findall(r"(semantic_kd_\w+)", r["expr"]))
    missing = used - with_suffixes
    assert not missing, f"rules reference unexported metrics: {missing}"


def test_prometheus_config_loads_the_rule_file():
    prom = yaml.safe_load((REPO / "infra" / "prometheus.yml").read_text())
    assert "alert_rules.yml" in prom.get("rule_files", [])
