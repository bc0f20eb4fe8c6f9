"""Declared table schemas for the weather pipelines (SURVEY §1.2).

Spark mapping of the reference's dict-of-SQL-types declarations:
- bronze analytics.world_weather: analytics__world_weather.py:159-171
- silver analytics.us_weather / canada_weather: analytics__us_weather.py:71-82
Timestamps stay VARCHAR strings, matching the reference's at-rest model.
"""

WORLD_WEATHER_SCHEMA: dict[str, str] = {
    "city": "VARCHAR",
    "country": "VARCHAR",
    "temperature": "DOUBLE",
    "feels_like": "DOUBLE",
    "humidity": "INTEGER",
    "pressure": "INTEGER",
    "weather": "VARCHAR",
    "weather_code": "INTEGER",
    "wind_speed": "DOUBLE",
    "timestamp": "VARCHAR",
    "date_id": "VARCHAR",
}

# bronze minus humidity/pressure (column pruning, P1) plus the CASE bucket
SILVER_WEATHER_SCHEMA: dict[str, str] = {
    "city": "VARCHAR",
    "country": "VARCHAR",
    "temperature": "DOUBLE",
    "feels_like": "DOUBLE",
    "weather": "VARCHAR",
    "weather_code": "INTEGER",
    "wind_speed": "DOUBLE",
    "timestamp": "VARCHAR",
    "temperature_category": "VARCHAR",
    "date_id": "VARCHAR",
}

# silver + literal region; the gold serving table
GOLD_WEATHER_COLUMNS = list(SILVER_WEATHER_SCHEMA) + ["region"]
