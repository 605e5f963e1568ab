package graft.fs

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's format_size/parse_size behavior
  * (/root/reference/tests/test_utils.py:13-74, tests/test_cli.py:16-63). */
class SizeUtilsSpec extends AnyFunSuite {

  test("formatSize matches reference boundaries") {
    assert(SizeUtils.formatSize(0) == "0 B")
    assert(SizeUtils.formatSize(1) == "1.0 B")
    assert(SizeUtils.formatSize(1023) == "1023.0 B")
    assert(SizeUtils.formatSize(1024) == "1.0 KB")
    assert(SizeUtils.formatSize(1536) == "1.5 KB")
    assert(SizeUtils.formatSize(1048576) == "1.0 MB")
    assert(SizeUtils.formatSize(1073741824L) == "1.0 GB")
    assert(SizeUtils.formatSize(1099511627776L) == "1.0 TB")
    // No PB unit in the reference (utils.py:11) — TB is the cap.
    assert(SizeUtils.formatSize(2048L * 1099511627776L) == "2048.0 TB")
  }

  test("parseSize units, case, whitespace, bare numbers") {
    assert(SizeUtils.parseSize("") == 0L)
    assert(SizeUtils.parseSize("100") == 100L)
    assert(SizeUtils.parseSize("100B") == 100L)
    assert(SizeUtils.parseSize("1K") == 1024L)
    assert(SizeUtils.parseSize("1KB") == 1024L)
    assert(SizeUtils.parseSize("1kb") == 1024L)
    assert(SizeUtils.parseSize("100MB") == 100L * 1048576L)
    assert(SizeUtils.parseSize("1.5 GB") == (1.5 * 1073741824L).toLong)
    assert(SizeUtils.parseSize("2T") == 2L * 1099511627776L)
  }

  test("parseSize rejects junk like the reference's ValueError") {
    for (bad <- Seq("abc", "12X", "MB100", "1.2.3KB", "-5MB"))
      assertThrows[IllegalArgumentException](SizeUtils.parseSize(bad))
  }

  test("property: parseSize(formatSize(n)) stays within rounding error") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = 1L + (rnd.nextDouble() * 1099511627776L * 512).toLong
      val parsed = SizeUtils.parseSize(SizeUtils.formatSize(n))
      // one-decimal formatting → relative error bounded well under 5%
      assert(math.abs(parsed - n).toDouble / n < 0.06, s"n=$n parsed=$parsed")
    }
  }
}
