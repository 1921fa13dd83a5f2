package graft

import graft.functions.TimeFunctions.parseToIso8601Utc

/** Mirrors the reference's pinned cases
  * (tests/resources/test_time_utils.py:17-69). */
class TimeFunctionsSpec extends SparkSpec {

  test("Z suffix normalizes to +00:00") {
    assert(parseToIso8601Utc("2025-01-27T10:26:06Z") == Some("2025-01-27T10:26:06+00:00"))
  }

  test("naive time treated as UTC") {
    assert(parseToIso8601Utc("2025-01-27T10:26:06") == Some("2025-01-27T10:26:06+00:00"))
  }

  test("explicit offset converted to UTC") {
    assert(parseToIso8601Utc("2025-01-27T11:26:06+01:00") == Some("2025-01-27T10:26:06+00:00"))
  }

  test("space separator accepted") {
    assert(parseToIso8601Utc("2025-01-27 10:26:06") == Some("2025-01-27T10:26:06+00:00"))
  }

  test("milliseconds kept, trailing zeros trimmed") {
    assert(parseToIso8601Utc("2025-01-27T10:26:06.123Z") == Some("2025-01-27T10:26:06.123+00:00"))
    assert(parseToIso8601Utc("2025-01-27T10:26:06.120000Z") == Some("2025-01-27T10:26:06.12+00:00"))
  }

  test("simple date expands to midnight UTC") {
    assert(parseToIso8601Utc("2021-11-01") == Some("2021-11-01T00:00:00+00:00"))
  }

  test("english short and long month formats") {
    assert(parseToIso8601Utc("1 Mar 2023") == Some("2023-03-01T00:00:00+00:00"))
    assert(parseToIso8601Utc("01 March 2023") == Some("2023-03-01T00:00:00+00:00"))
    assert(parseToIso8601Utc("1 Mar 2023 10:26:06") == Some("2023-03-01T10:26:06+00:00"))
  }

  test("slash and dash day-first formats") {
    assert(parseToIso8601Utc("01/03/2023") == Some("2023-03-01T00:00:00+00:00"))
    assert(parseToIso8601Utc("01-03-2023") == Some("2023-03-01T00:00:00+00:00"))
  }

  test("empty string passes through; junk and time-only are None") {
    assert(parseToIso8601Utc("") == Some(""))
    assert(parseToIso8601Utc("not a date") == None)
    assert(parseToIso8601Utc("10:26:06") == None)
    assert(parseToIso8601Utc(null) == None)
  }
}
