#!/usr/bin/env python3
"""Generate X18 formatter goldens by executing the REFERENCE'S OWN code.

Extracts (via ast) `get_health_summary` from backend/chatbot.py and
`format_sleep_response` / `get_safety_recommendations` from
backend/tools/safe_places_to_sleep.py — their modules have unimportable
top-level imports (vertexai, fastapi) — and runs them on fixtures. Data
access (db.query chains) is stubbed to return the fixture rows; every
FORMATTING line executed is the reference's verbatim source. Output:
Scala string literals to paste into ResfmtSpec.
"""
import ast, sys, types, asyncio
from datetime import datetime

REF = "/root/reference/backend"


def extract(path, names):
    src = open(path).read()
    tree = ast.parse(src)
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name in names:
            out[node.name] = ast.get_source_segment(src, node)
    missing = set(names) - set(out)
    assert not missing, f"functions not found: {missing}"
    return out


# ---- stub modules for get_health_summary's inline imports ----------------
class Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class Col:  # model-attribute stub: .desc() in order_by chains
    def desc(self):
        return self


health_models = types.ModuleType("health_models")
for cls in ("Medication", "SymptomLog", "VitalSign", "CarePlan"):
    setattr(health_models, cls, type(cls, (), {"user_id": Col(), "is_active": Col(),
            "logged_at": Col(), "measured_at": Col(), "status": Col()}))
sqlalchemy = types.ModuleType("sqlalchemy")
sqlalchemy.and_ = lambda *a, **k: None
sys.modules["health_models"] = health_models
sys.modules["sqlalchemy"] = sqlalchemy


class FakeQuery:
    def __init__(self, rows):
        self.rows = rows
    def filter(self, *a):
        return self
    def order_by(self, *a):
        return self
    def limit(self, n):
        return FakeQuery(self.rows[:n])
    def all(self):
        return self.rows


class FakeDb:
    def __init__(self, by_model):
        self.by_model = by_model
    def query(self, model):
        return FakeQuery(self.by_model[model.__name__])


# ---- fixtures ------------------------------------------------------------
meds = [
    Obj(name="Metformin", dosage="500mg", frequency="twice daily",
        purpose="blood sugar control", reminder_times=["08:00", "20:00"]),
    Obj(name="Lisinopril", dosage="10mg", frequency="once daily",
        purpose=None, reminder_times=None),
]
symptoms = [  # list order == logged_at DESC (the stub ignores order_by)
    Obj(symptom="Headache", severity=8, duration="2 hours",
        description="throbbing, right side",
        logged_at=datetime(2024, 1, 10, 14, 30)),
    Obj(symptom="Fatigue", severity=5, duration=None, description=None,
        logged_at=datetime(2024, 1, 9, 9, 0)),
    Obj(symptom="Cough", severity=2, duration="3 days", description=None,
        logged_at=datetime(2024, 1, 8, 21, 15)),
]
vitals = [
    Obj(measurement_type="blood_pressure", systolic=150, diastolic=95,
        value=None, unit=None, is_abnormal=True, notes=None,
        measured_at=datetime(2024, 1, 10, 8, 0)),
    Obj(measurement_type="heart_rate", systolic=None, diastolic=None,
        value=72.5, unit="bpm", is_abnormal=False, notes="resting, after coffee",
        measured_at=datetime(2024, 1, 9, 8, 0)),
]
plans = [
    Obj(title="Diabetes Management", condition="Type 2 Diabetes",
        primary_provider="Dr. Chen", next_appointment=datetime(2024, 2, 15)),
    Obj(title="General Wellness", condition=None, primary_provider=None,
        next_appointment=None),
]

fns = extract(f"{REF}/chatbot.py", ["get_health_summary"])
ns = {"print": print}
exec(fns["get_health_summary"], ns)
db = FakeDb({"Medication": meds, "SymptomLog": symptoms,
             "VitalSign": vitals, "CarePlan": plans})
health_golden = asyncio.run(ns["get_health_summary"](1, db))
empty_golden = asyncio.run(ns["get_health_summary"](1, FakeDb(
    {"Medication": [], "SymptomLog": [], "VitalSign": [], "CarePlan": []})))

fns2 = extract(f"{REF}/tools/safe_places_to_sleep.py",
               ["format_sleep_response", "get_safety_tips"])
from typing import Dict, List
ns2 = {"Dict": Dict, "List": List}
exec(fns2["get_safety_tips"], ns2)
exec(fns2["format_sleep_response"], ns2)
tips = ns2["get_safety_tips"]()
sleep_data = {
    "location": "32.7100, -117.1600",
    "current_time": "2024-01-10 22:30",
    "search_radius_miles": 2.0,
    "weather_condition": "clear",
    "weather_recommendation": "✅ Weather is mild - outdoor options are viable tonight",
    "options_found": 2,
    "options": [
        {"heading": "Jewish Family Service Safe Parking", "type": "safe_parking",
         "category": "Overnight parking program",
         "info": "Gated lot, restrooms, case management",
         "source_url": "https://example.org/safe-parking"},
        {"heading": "Old Town Transit Center", "type": "transit_hubs",
         "category": "24-hour transit hub",
         "info": "Well-lit, security presence", "source_url": ""},
    ],
    "safety_tips": tips,
}
sleep_golden = ns2["format_sleep_response"](sleep_data)
noopt_golden = ns2["format_sleep_response"]({**sleep_data, "options_found": 0,
                                            "options": []})
err_golden = ns2["format_sleep_response"](
    {"error": "Geocoding service unavailable",
     "recommendation": "Try again with a street address or cross-streets"})


def scala(s):
    body = (s.replace("\\", "\\\\").replace('"', '\\"')
             .replace("\n", "\\n\" +\n      \""))
    return '      "' + body + '"'


for name, val in [("health", health_golden), ("healthEmpty", empty_golden),
                  ("sleep", sleep_golden), ("sleepNoOpt", noopt_golden),
                  ("sleepErr", err_golden)]:
    print(f"=== {name} ===")
    print(scala(val))
print("=== tips (scala Seq) ===")
for t in tips:
    print('    "' + t.replace('"', '\\"') + '",')
