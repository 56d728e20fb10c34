"""Golden-fixture parity against the reference's own test data.

Input: /root/reference/python_etl/test_data/DE_0 (8 CSVs, 2 patients).
Expected: the hand-verified outputs in test_data/output/*.csv
(python_etl/README.md:133-146).  Comparison is value-level on natural
keys, modulo the surrogate-id scheme (the reference mints ids from a
mutable global counter; this engine mints replay-stable hashes), so
surrogate links (visit/provider/care-site ids) are compared through
their source values.

The concept dictionary is reconstructed from the golden outputs
themselves — in production it is the OMOP vocabulary download, which
the reference also treats as input (README.md:121-124); what is under
test here is the pipeline (visit dedup + reuse, positional type
concepts, domain routing, dimension first-write-wins), not the
vocabulary content.

Two documented fixture anomalies (asserted, so a change in behavior
is caught):
* person 0004D03F1BD5E607's golden observation/payer periods start
  2008-07-01 (the hand-coders applied age-65 Medicare enrollment),
  but every rule derivable from the beneficiary file (coverage months
  are 12 for all years/plans) yields 2008-01-01.  The engine follows
  the README j) coverage rule.
* golden location.state holds the raw SSA code ('15') although
  README g) says SSA codes were mapped to 2-letter states; the engine
  maps (IN) and the test compares the county + source key.
"""

import csv
import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.plans import cdm, claims
from etl_cms_spark.sources import synpuf

REF = "/root/reference/python_etl/test_data"
DE0 = os.path.join(REF, "DE_0")
GOLD = os.path.join(REF, "output")

# codes that originate in ICD9 columns (dgns / prcdr) of the DE_0
# claims; every other mapped procedure/condition source is HCPCS.
_ICD9_PROC_SOURCES = {"7869", "V0751"}

# the hand-coded golden stripped the leading zero from ICD9 '0416'
# (an Excel-style artifact); the input column carries '0416'.
_GOLDEN_CODE_FIXUPS = {"416": "0416"}


def _fix(code: str) -> str:
    return _GOLDEN_CODE_FIXUPS.get(code, code)


def _gold(name):
    with open(os.path.join(GOLD, f"{name}.csv")) as f:
        return list(csv.DictReader(f))


def _vocab_from_golden(spark):
    rows = set()
    for r in _gold("condition_occurrence"):
        rows.add(("ICD9", _fix(r["condition_source_value"]),
                  int(r["condition_source_concept_id"]), int(r["condition_concept_id"]), "Condition"))
    for r in _gold("procedure_occurrence"):
        vocab = "ICD9" if r["procedure_source_value"] in _ICD9_PROC_SOURCES else "HCPCS"
        rows.add((vocab, r["procedure_source_value"],
                  int(r["procedure_source_concept_id"]), int(r["procedure_concept_id"]), "Procedure"))
    for r in _gold("drug_exposure"):
        rows.add(("NDC", r["drug_source_value"],
                  int(r["drug_source_concept_id"]), int(r["drug_concept_id"]), "Drug"))
    for r in _gold("observation"):
        rows.add(("ICD9", r["observation_source_value"],
                  int(r["observation_source_concept_id"]), int(r["observation_concept_id"]), "Observation"))
    return spark.createDataFrame(
        sorted(rows),
        "vocab string, code string, source_concept_id long, target_concept_id long, domain string",
    )


@pytest.fixture(scope="module")
def de0(spark):
    bene = synpuf.read_beneficiary_summaries(
        spark,
        [os.path.join(DE0, f"DE1_0_{y}_Beneficiary_Summary_File_Sample_0.csv") for y in (2008, 2009, 2010)],
    )
    inpat = synpuf.read_inpatient_claims(spark, os.path.join(DE0, "DE1_0_2008_to_2010_Inpatient_Claims_Sample_0.csv"))
    outpat = synpuf.read_outpatient_claims(spark, os.path.join(DE0, "DE1_0_2008_to_2010_Outpatient_Claims_Sample_0.csv"))
    carrier = synpuf.read_carrier_claims(
        spark,
        [os.path.join(DE0, f"DE1_0_2008_to_2010_Carrier_Claims_Sample_0{h}.csv") for h in ("A", "B")],
    )
    rx = synpuf.read_prescription_events(spark, os.path.join(DE0, "DE1_0_2008_to_2010_Prescription_Drug_Events_Sample_0.csv"))
    vocab = _vocab_from_golden(spark)
    events = claims.all_code_events(inpat, outpat, carrier)
    mapped = claims.map_codes(events, vocab).localCheckpoint()
    return dict(bene=bene, inpat=inpat, outpat=outpat, carrier=carrier, rx=rx, vocab=vocab, mapped=mapped)


def test_person_parity(spark, de0):
    ours = {
        r["person_source_value"]: r
        for r in cdm.build_person(de0["bene"]).collect()
    }
    gold_loc = {r["location_id"]: r["location_source_value"] for r in _gold("location")}
    gold = _gold("person")
    assert len(gold) == len(ours) == 2
    for g in gold:
        o = ours[g["person_id"]]  # golden person_id IS the source id
        assert o["gender_concept_id"] == int(g["gender_concept_id"])
        assert o["race_concept_id"] == int(g["race_concept_id"])
        assert o["ethnicity_concept_id"] == int(g["ethnicity_concept_id"])
        assert o["year_of_birth"] == int(g["year_of_birth"])
        assert o["month_of_birth"] == int(g["month_of_birth"])
        assert o["day_of_birth"] == int(g["day_of_birth"])
        assert o["location_source_value"].lstrip("0").replace("-0", "-") == gold_loc[g["location_id"]].replace("-0", "-") or (
            # golden key is unpadded '15-680'; ours zero-pads '15-680'
            tuple(int(x) for x in o["location_source_value"].split("-"))
            == tuple(int(x) for x in gold_loc[g["location_id"]].split("-"))
        )


def test_location_parity(spark, de0):
    ours = {tuple(int(x) for x in r["location_source_value"].split("-")): r
            for r in cdm.build_location(de0["bene"]).collect()}
    gold = _gold("location")
    assert len(gold) == len(ours) == 2
    for g in gold:
        key = tuple(int(x) for x in g["location_source_value"].split("-"))
        o = ours[key]
        assert int(o["county"]) == int(g["county"])
        # golden keeps the raw SSA code in `state` (README g says
        # mapped; the hand-coded file disagrees) — we assert OUR
        # mapping is the documented 2-letter code.
        assert o["state"] in ("IN", "CA")


def test_death_is_empty(spark, de0):
    assert cdm.build_death(de0["bene"]).count() == 0 == len(_gold("death"))


def test_observation_period_parity(spark, de0):
    ours = {r["person_id"]: r for r in cdm.build_observation_period(de0["bene"]).collect()}
    by_src = {
        r["desynpuf_id"]: F.lit(None)
        for r in de0["bene"].select("desynpuf_id").distinct().collect()
    }
    assert len(by_src) == 2
    import pyspark.sql.functions as SF

    id_map = {
        r["desynpuf_id"]: r["pid"]
        for r in de0["bene"].select("desynpuf_id", SF.xxhash64("desynpuf_id").alias("pid")).distinct().collect()
    }
    gold = {r["person_id"]: r for r in _gold("observation_period")}
    # person 1: full parity under the coverage rule
    g1 = gold["0002056B40CEE448"]
    o1 = ours[id_map["0002056B40CEE448"]]
    assert str(o1["observation_period_start_date"]) == g1["observation_period_start_date"]
    assert str(o1["observation_period_end_date"]) == g1["observation_period_end_date"]
    # person 2: end matches; golden start is the age-65 anomaly
    g2 = gold["0004D03F1BD5E607"]
    o2 = ours[id_map["0004D03F1BD5E607"]]
    assert str(o2["observation_period_end_date"]) == g2["observation_period_end_date"]
    assert str(o2["observation_period_start_date"]) == "2008-01-01"
    assert g2["observation_period_start_date"] == "2008-07-01"  # documented anomaly


def test_observation_period_code_faithful_form(spark, de0):
    """The reference CODE derives [min, max] of visit dates
    (:844-860); assert that form on DE_0 directly."""
    latest = cdm.latest_year_rows(de0["bene"])
    out = {
        r["person_source_value"]: r
        for r in claims.build_observation_period_from_visits(de0["mapped"], latest, de0["rx"]).collect()
    }
    assert str(out["0002056B40CEE448"]["observation_period_start_date"]) == "2008-02-29"
    assert str(out["0002056B40CEE448"]["observation_period_end_date"]) == "2010-03-30"
    assert str(out["0004D03F1BD5E607"]["observation_period_start_date"]) == "2008-04-07"
    assert str(out["0004D03F1BD5E607"]["observation_period_end_date"]) == "2010-08-10"


def test_payer_plan_period_parity(spark, de0):
    plan_names = {
        "MEDICARE_HI": "Part A",
        "MEDICARE_SMI": "Part B",
        "MEDICARE_HMO": "HMO",
        "PART_D": "Part D",
    }
    id_map = {
        r["desynpuf_id"]: r["pid"]
        for r in de0["bene"].select("desynpuf_id", F.xxhash64("desynpuf_id").alias("pid")).distinct().collect()
    }
    ours = {
        (r["person_id"], plan_names[r["plan_source_value"]]):
        (str(r["payer_plan_period_start_date"]), str(r["payer_plan_period_end_date"]))
        for r in cdm.build_payer_plan_period(de0["bene"]).collect()
    }
    gold = {
        (id_map[r["person_id"]], r["plan_source_value"]):
        (r["payer_plan_period_start_date"], r["payer_plan_period_end_date"])
        for r in _gold("payer_plan_period")
    }
    assert set(ours) == set(gold)  # same (person, plan) coverage set
    for k, (gs, ge) in gold.items():
        os_, oe = ours[k]
        assert oe == ge, k
        if k[0] == id_map["0002056B40CEE448"]:
            assert os_ == gs, k  # person 1 exact
        else:
            assert os_ == "2008-01-01" and gs == "2008-07-01"  # anomaly


def test_visit_occurrence_parity(spark, de0):
    ours = {
        r["visit_source_value"]: r
        for r in claims.build_visit_occurrence(de0["mapped"]).collect()
    }
    gold = _gold("visit_occurrence")
    assert len(gold) == len(ours) == 6
    for g in gold:
        o = ours[g["visit_source_value"]]  # CLM_ID is the natural key
        assert o["person_source_value"] == g["person_id"]
        assert o["visit_concept_id"] == int(g["visit_concept_id"])
        assert str(o["visit_start_date"]) == g["visit_start_date"]
        assert str(o["visit_end_date"]) == g["visit_end_date"]
        assert o["visit_type_concept_id"] == int(g["visit_type_concept_id"])


def _gold_visit_srcvalue_by_id():
    return {r["visit_occurrence_id"]: r["visit_source_value"] for r in _gold("visit_occurrence")}


def _our_visit_srcvalue_by_id(de0):
    return {
        r["visit_occurrence_id"]: r["visit_source_value"]
        for r in claims.build_visit_occurrence(de0["mapped"]).collect()
    }


def _gold_provider_npi_by_id():
    return {r["provider_id"]: r["npi"] for r in _gold("provider")}


def test_condition_occurrence_parity(spark, de0):
    gvisit = _gold_visit_srcvalue_by_id()
    ovisit = _our_visit_srcvalue_by_id(de0)
    gnpi = _gold_provider_npi_by_id()
    ours = {
        (
            r["person_source_value"], r["condition_concept_id"],
            str(r["condition_start_date"]), str(r["condition_end_date"]),
            r["condition_type_concept_id"], r["condition_source_value"],
            r["condition_source_concept_id"], ovisit[r["visit_occurrence_id"]],
            r["provider_npi"],
        )
        for r in claims.build_condition_occurrence(de0["mapped"]).collect()
    }
    gold = {
        (
            g["person_id"], int(g["condition_concept_id"]),
            g["condition_start_date"], g["condition_end_date"],
            int(g["condition_type_concept_id"]), _fix(g["condition_source_value"]),
            int(g["condition_source_concept_id"]), gvisit[g["visit_occurrence_id"]],
            gnpi.get(g["provider_id"]),
        )
        for g in _gold("condition_occurrence")
    }
    assert len(gold) == 28
    assert ours == gold


def test_procedure_occurrence_parity(spark, de0):
    gvisit = _gold_visit_srcvalue_by_id()
    ovisit = _our_visit_srcvalue_by_id(de0)
    gnpi = _gold_provider_npi_by_id()
    ours = {
        (
            r["person_source_value"], r["procedure_concept_id"],
            str(r["procedure_date"]), r["procedure_type_concept_id"],
            r["procedure_source_value"], r["procedure_source_concept_id"],
            ovisit[r["visit_occurrence_id"]], r["provider_npi"],
        )
        for r in claims.build_procedure_occurrence(de0["mapped"]).collect()
    }
    gold = {
        (
            g["person_id"], int(g["procedure_concept_id"]),
            g["procedure_date"], int(g["procedure_type_concept_id"]),
            g["procedure_source_value"], int(g["procedure_source_concept_id"]),
            gvisit[g["visit_occurrence_id"]], gnpi.get(g["provider_id"]),
        )
        for g in _gold("procedure_occurrence")
    }
    assert len(gold) == 10
    assert ours == gold


def test_drug_exposure_parity(spark, de0):
    ours = {
        (
            r["person_source_value"], r["drug_concept_id"],
            str(r["drug_exposure_start_date"]), r["drug_type_concept_id"],
            r["quantity"], r["days_supply"],
            r["drug_source_value"], r["drug_source_concept_id"],
        )
        for r in claims.build_drug_exposure_rx(de0["rx"], de0["vocab"]).collect()
    }
    gold = {
        (
            g["person_id"], int(g["drug_concept_id"]),
            g["drug_exposure_start_date"], int(g["drug_type_concept_id"]),
            float(g["quantity"]), int(g["days_supply"]),
            g["drug_source_value"], int(g["drug_source_concept_id"]),
        )
        for g in _gold("drug_exposure")
    }
    assert len(gold) == 2
    assert ours == gold


def test_care_site_parity(spark, de0):
    ours = {
        (r["care_site_source_value"], r["place_of_service_concept_id"])
        for r in claims.build_care_site(de0["inpat"], de0["outpat"], de0["carrier"]).collect()
    }
    gold = {
        (g["care_site_source_value"], int(g["place_of_service_concept_id"]))
        for g in _gold("care_site")
    }
    assert len(gold) == 6
    assert ours == gold


def test_provider_parity(spark, de0):
    gold_cs = {r["care_site_id"]: r["care_site_source_value"] for r in _gold("care_site")}
    ours = {
        (r["npi"], r["care_site_source_value"])
        for r in claims.build_provider(de0["inpat"], de0["outpat"], de0["carrier"]).collect()
    }
    gold = {(g["npi"], gold_cs[g["care_site_id"]]) for g in _gold("provider")}
    assert len(gold) == 6
    assert ours == gold


def test_unmapped_codes_quarantined(spark, de0):
    """Codes outside the vocabulary go to the anti-join channel, not
    to any output table (reference unmapped_code_log.txt).  With the
    COMPLETE golden vocabulary (incl. the Observation routes) DE_0
    maps fully; dropping a code from the vocabulary must route it to
    quarantine and out of every output table."""
    events = claims.all_code_events(de0["inpat"], de0["outpat"], de0["carrier"])
    assert claims.unmapped_codes(events, de0["vocab"]).count() == 0
    holed = de0["vocab"].where(F.col("code") != "V1588")
    um = {r["code"] for r in claims.unmapped_codes(events, holed).collect()}
    assert um == {"V1588"}
    remapped = claims.map_codes(events, holed)
    assert remapped.where(F.col("code") == "V1588").count() == 0
    assert claims.build_observation(remapped).where(
        F.col("observation_source_value") == "V1588"
    ).count() == 0


# ---------------------------------------------------------------------
# Round 3: the remainder of the golden surface — observation, the three
# cost tables, fact_relationship.
# ---------------------------------------------------------------------

_PLAN_NAMES = {
    "MEDICARE_HI": "Part A",
    "MEDICARE_SMI": "Part B",
    "MEDICARE_HMO": "HMO",
    "PART_D": "Part D",
}


def _gold_ppp_by_id():
    """golden payer_plan_period_id → (person_source_value, plan name)."""
    return {
        r["payer_plan_period_id"]: (r["person_id"], r["plan_source_value"])
        for r in _gold("payer_plan_period")
    }


def _gold_visit_person_by_id():
    return {r["visit_occurrence_id"]: r["person_id"] for r in _gold("visit_occurrence")}


def test_observation_parity(spark, de0):
    """5 golden rows: carrier line dgns routed to Observation (78052,
    V0481 — the latter on two lines, collapsed to ONE row), outpatient
    V1588, inpatient V065/E8889.  Golden row 3's person_id
    '0002056B40CEE450' is a hand-typo (no such beneficiary exists in
    DE_0; the row's visit 3 belongs to ...448) — compared through the
    visit, and the typo asserted so a fixture change is caught."""
    gnpi = _gold_provider_npi_by_id()
    gvisit = _gold_visit_srcvalue_by_id()
    ovisit = _our_visit_srcvalue_by_id(de0)
    ours = {
        (
            r["observation_concept_id"], str(r["observation_date"]),
            r["observation_type_concept_id"], r["value_as_concept_id"],
            r["provider_npi"], ovisit[r["visit_occurrence_id"]],
            r["observation_source_value"], r["observation_source_concept_id"],
        )
        for r in claims.build_observation(de0["mapped"]).collect()
    }
    gold = {
        (
            int(g["observation_concept_id"]), g["observation_date"],
            int(g["observation_type_concept_id"]), int(g["value_as_concept_id"]),
            gnpi.get(g["provider_id"]), gvisit[g["visit_occurrence_id"]],
            g["observation_source_value"], int(g["observation_source_concept_id"]),
        )
        for g in _gold("observation")
    }
    assert len(gold) == 5
    assert ours == gold
    # person check through the visit (and the documented typo)
    gperson = _gold_visit_person_by_id()
    by_visit = {
        ovisit[r["visit_occurrence_id"]]: r["person_source_value"]
        for r in claims.build_observation(de0["mapped"]).collect()
    }
    for g in _gold("observation"):
        assert by_visit[gvisit[g["visit_occurrence_id"]]] == gperson[g["visit_occurrence_id"]]
    typo = [g for g in _gold("observation") if g["observation_source_value"] == "V1588"]
    assert typo[0]["person_id"] == "0002056B40CEE450"  # documented anomaly
    assert gperson[typo[0]["visit_occurrence_id"]] == "0002056B40CEE448"


def test_visit_cost_parity(spark, de0):
    """4 golden rows — one per inpatient/outpatient claim (carrier
    amounts are line-level → procedure_cost): Part A for inpatient,
    Part B for outpatient; totals = payer + deductible + coinsurance."""
    gvisit = _gold_visit_srcvalue_by_id()
    gppp = _gold_ppp_by_id()
    ours = {
        (
            r["clm_id"],
            r["paid_coinsurance"], r["paid_toward_deductible"],
            r["paid_by_payer"], r["paid_by_coordination_benefits"],
            r["total_out_of_pocket"], r["total_paid"],
            (r["person_source_value"], _PLAN_NAMES[r["plan_source_value"]]),
        )
        for r in claims.build_visit_cost(de0["inpat"], de0["outpat"]).collect()
    }
    gold = {
        (
            gvisit[g["visit_occurrence_id"]],
            float(g["paid_coinsurance"]), float(g["paid_toward_ deductible"]),
            float(g["paid_by_payer"]), float(g["paid_by_coordination_benefits"]),
            float(g["total_out_of_pocket"]), float(g["total_paid"]),
            gppp[g["payer_plan_period_id"]],
        )
        for g in _gold("visit_cost")
    }
    assert len(gold) == 4
    assert ours == gold


def test_procedure_cost_parity(spark, de0):
    """4 golden rows — carrier claim lines whose HCPCS maps to
    Procedure, P5 amount-gated, each paired with its OWN line amounts;
    the payer-plan link (range join through link_payer_plan_period)
    must land every row on the person's Part B period."""
    gppp = _gold_ppp_by_id()
    # golden procedure id → its source value (the line HCPCS)
    gproc = {r["procedure_occurrence_id"]: r for r in _gold("procedure_occurrence")}
    cost = claims.build_procedure_cost(de0["carrier"], de0["vocab"])
    ppp = cdm.build_payer_plan_period(de0["bene"])
    linked = claims.link_payer_plan_period(cost, ppp, "procedure_date")
    ppp_key = {
        r["payer_plan_period_id"]: (r["person_id"], r["plan_source_value"])
        for r in ppp.collect()
    }
    id_map = {
        r["desynpuf_id"]: r["pid"]
        for r in de0["bene"].select(
            "desynpuf_id", F.xxhash64("desynpuf_id").alias("pid")
        ).distinct().collect()
    }
    ours = {
        (
            r["procedure_source_value"], str(r["procedure_date"]),
            r["paid_coinsurance"], r["paid_toward_deductible"],
            r["paid_by_payer"], r["paid_by_coordination_benefits"],
            r["total_out_of_pocket"], r["total_paid"],
            r["revenue_code_concept_id"],
            (r["person_source_value"], _PLAN_NAMES[ppp_key[r["payer_plan_period_id"]][1]]),
        )
        for r in linked.collect()
    }
    gold = {
        (
            gproc[g["procedure_occurrence_id"]]["procedure_source_value"],
            gproc[g["procedure_occurrence_id"]]["procedure_date"],
            float(g["paid_coinsurance"]), float(g["paid_toward_deductible"]),
            float(g["paid_by_payer"]), float(g["paid_by_coordination_benefits"]),
            float(g["total_out_of_pocket"]), float(g["total_paid"]),
            int(g["revenue_code_concept_id"]),
            (gppp[g["payer_plan_period_id"]][0], gppp[g["payer_plan_period_id"]][1]),
        )
        for g in _gold("procedure_cost")
    }
    assert len(gold) == 4
    assert ours == gold
    # every linked row's ppp person must equal the cost row's person
    for r in linked.collect():
        assert ppp_key[r["payer_plan_period_id"]][0] == id_map[r["person_source_value"]]


def test_drug_cost_parity(spark, de0):
    """2 golden rows — one per prescription event: coinsurance =
    out-of-pocket = PTNT_PAY_AMT, total = TOT_RX_CST_AMT, Part D."""
    gdrug = {r["drug_exposure_id"]: r for r in _gold("drug_exposure")}
    gppp = _gold_ppp_by_id()
    ours = {
        (
            r["person_source_value"], r["drug_source_value"],
            str(r["drug_exposure_start_date"]),
            r["paid_coinsurance"], r["total_out_of_pocket"], r["total_paid"],
            _PLAN_NAMES[r["plan_source_value"]],
        )
        for r in claims.build_drug_cost(de0["rx"]).collect()
    }
    gold = {
        (
            gdrug[g["drug_exposure_id"]]["person_id"],
            gdrug[g["drug_exposure_id"]]["drug_source_value"],
            gdrug[g["drug_exposure_id"]]["drug_exposure_start_date"],
            float(g["paid_coinsurance"]), float(g["total_out_of_pocket"]),
            float(g["total_paid"]),
            gppp[g["payer_plan_period_id"]][1],
        )
        for g in _gold("drug_cost")
    }
    assert len(gold) == 2
    assert ours == gold


def test_fact_relationship_parity(spark, de0):
    """8 golden rows — per carrier procedure line: a line-dx link
    (44818784) in the dx's routed domain (Condition 19 / Observation
    27) and a principal-dx link (44818841, golden domain constant 57)
    falling back to the claim's first claim-level Condition when the
    line dx routed elsewhere.  Golden integer fact ids are mapped to
    natural keys through the referenced golden tables."""
    gproc = {r["procedure_occurrence_id"]: r["procedure_source_value"]
             for r in _gold("procedure_occurrence")}
    gcond = {r["condition_occurrence_id"]: r["condition_source_value"]
             for r in _gold("condition_occurrence")}
    gobs = {r["observation_id"]: r["observation_source_value"]
            for r in _gold("observation")}

    def src1(g):
        d = int(g["domain_concept _id_1"])
        if d == claims.DOMAIN_CONCEPT_IDS["Observation"]:
            return gobs[g["fact_id_1"]]
        return gcond[g["fact_id_1"]]  # 19 and the pinned 57 both → condition

    gold = {
        (
            int(g["domain_concept _id_1"]), src1(g),
            int(g["domain_concept_id_2"]), gproc[g["fact_id_2"]],
            int(g["relationship_concept_id"]),
        )
        for g in _gold("fact_relationship")
    }
    ours = {
        (
            r["domain_concept_id_1"], r["fact_source_value_1"],
            r["domain_concept_id_2"], r["fact_source_value_2"],
            r["relationship_concept_id"],
        )
        for r in claims.build_fact_relationship(de0["carrier"], de0["vocab"]).collect()
    }
    assert len(gold) == 8
    assert ours == gold


def test_measurement_specimen_device_empty_parity(spark, de0):
    """The last visible parity gap (round-3 verdict): the reference
    routes Measurement/Device domains (dispatch :1261-1290) and ships
    empty-but-headered measurement.csv / specimen.csv /
    device_exposure.csv goldens for DE_0.  The engine must AGREE they
    are empty — the builders run on the full mapped DE_0 stream and
    produce zero rows, matching the golden files."""
    assert claims.build_measurement(de0["mapped"]).count() == 0 == len(_gold("measurement"))
    assert claims.build_device_exposure(de0["mapped"]).count() == 0 == len(_gold("device_exposure"))
    # specimen: the reference declares the output file but its
    # dispatch has no route that writes one (no DESTINATION_FILE_
    # SPECIMEN branch) — empty by construction on ANY input, which is
    # exactly what the golden shows.
    assert len(_gold("specimen")) == 0


def test_measurement_device_domain_routing(spark, de0):
    """A synthetic vocab entry per missing domain proves the dispatch
    route is real: a carrier HCPCS code remapped to Measurement /
    Device flows into the corresponding builder with the reference's
    type concepts, dates, and visit linkage."""
    # take one real carrier event so visit/provider linkage is real
    ev = claims.all_code_events(de0["inpat"], de0["outpat"], de0["carrier"])
    one = ev.where(F.col("vocab") == "HCPCS").limit(1).collect()[0]
    synth_vocab = spark.createDataFrame(
        [
            ("HCPCS", one["code"], 901, 9001, "Measurement"),
            ("HCPCS", one["code"], 902, 9002, "Device"),
        ],
        "vocab string, code string, source_concept_id long, target_concept_id long, domain string",
    )
    mapped = claims.map_codes(ev, synth_vocab)
    meas = claims.build_measurement(mapped).collect()
    dev = claims.build_device_exposure(mapped).collect()
    assert meas and all(
        r["measurement_concept_id"] == 9001
        and r["measurement_source_concept_id"] == 901
        and r["measurement_type_concept_id"] == claims.MEASUREMENT_TYPE_DERIVED_VALUE
        and r["measurement_source_value"] == one["code"]
        and r["visit_occurrence_id"] is not None
        for r in meas
    )
    assert dev and all(
        r["device_concept_id"] == 9002
        and r["device_type_concept_id"] == claims.DEVICE_TYPE_INFERRED_PROCEDURE_CLAIM
        and r["device_exposure_start_date"] is not None
        and r["device_exposure_end_date"] is not None
        and r["visit_occurrence_id"] is not None
        for r in dev
    )
