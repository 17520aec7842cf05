// Generates golden vectors for the deterministic-draw parity kernel.
// Semantics under test (public JDK + reference behavior, re-derived):
//   pseudoRandomFromString(s) = SHA-1(UTF-8(s)) -> first 8 bytes big-endian
//     signed long -> new java.util.Random(seed).nextDouble()
//   (reference: com.ibm.research.ai.ki.util/RandomUtil.java:37-47)
// Output: TSV lines  kind \t input \t value
import java.nio.charset.StandardCharsets;
import java.security.MessageDigest;
import java.util.Random;

public class GenGoldenVectors {
    static double pseudoRandomFromString(String str) throws Exception {
        MessageDigest md = MessageDigest.getInstance("SHA-1");
        byte[] d = md.digest(str.getBytes(StandardCharsets.UTF_8));
        long value = java.nio.ByteBuffer.wrap(d).getLong();
        return new Random(value).nextDouble();
    }

    public static void main(String[] args) throws Exception {
        String[] cases = {
            "", "a", "abc", "hello world", "http://example.com/",
            "https://EXAMPLE.com:443/path?q=1#frag",
            "SAMPLEDOCsome text", "DOWNSAMPLEIDa\tb", "SPLITa\tb",
            "GS:the quick brown fox", "unicode \u00e9\u00e8\u00ea \u4e2d\u6587 \ud83d\ude00",
            "x".repeat(1000),
            "tab\tsep", "newline\nsep", "dbr:Some_Entity",
            "http://host0.example.com/page/1",
            "http://host1.example.com/page/2?a=b",
        };
        for (String s : cases) {
            String key = s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n");
            System.out.println("prand\t" + key + "\t" + pseudoRandomFromString(s));
            System.out.println("hashcode\t" + key + "\t" + s.hashCode());
            // learning-curve draw: new Random(s.hashCode() + 123321).nextDouble()
            System.out.println("lcdraw\t" + key + "\t" + new Random(s.hashCode() + 123321).nextDouble());
            // partition assignment: new Random(s.hashCode()).nextInt(8)
            System.out.println("nextint8\t" + key + "\t" + new Random(s.hashCode()).nextInt(8));
            System.out.println("nextint7\t" + key + "\t" + new Random(s.hashCode()).nextInt(7));
        }
        // raw Random seeds -> nextDouble
        long[] seeds = {0L, 1L, -1L, 42L, Long.MAX_VALUE, Long.MIN_VALUE, 123456789L, -987654321L};
        for (long seed : seeds) {
            System.out.println("seeddouble\t" + seed + "\t" + new Random(seed).nextDouble());
        }
    }
}
