package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the heavyweight integration suites (whole-board
 * plan builds, bench-scale fixtures, iterative-loop end-to-ends).
 * `sbt smoke` excludes these for the fast inner-loop tier; plain
 * `sbt test` remains the full certification gate.
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface Heavy {}
